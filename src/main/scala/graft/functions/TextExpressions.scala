package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native text-repetition expression (builder brief: custom `Expression`
  * with `doGenCode` beats a UDF beats interpreted HOFs).
  *
  * The higher-order-function formulation of the dup-n-gram rule
  * ([[TextAnalysis.dupNgramFrac]]: transform → slice → concat_ws →
  * array_distinct) is interpreted — every gram allocates a lambda-eval'd
  * slice copy plus a joined string, and `size`/`array_distinct` walk the
  * gram array again. That made q_dup_ngrams the slowest query in the
  * round-4 bench (3.3 s at sf0.1, ~5× the next text query). This
  * expression fuses gram construction + distinct counting into ONE
  * hash-set pass per row, called from whole-stage codegen, and returns
  * both outputs (total grams, duplicated fraction) in a single struct so
  * the pass never runs twice per n.
  *
  * Tokens come from whitespace splitting, so they cannot contain ' ' and
  * the space-joined gram key is injective — HashSet-of-joined-string
  * distinct equals distinct over token tuples (the exact semantics of the
  * HOF form and the DuckDB oracle twin; [[graft.TextRulesSpec]] asserts
  * native == HOF on crafted docs).
  */
case class NgramRepetition(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = NgramRepetition.Out

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    NgramRepetition.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.NgramRepetition.compute($arr, $n);")

  override protected def withNewChildInternal(c: Expression): NgramRepetition =
    copy(child = c)
}

object NgramRepetition {
  /** struct<n_grams:int, dup_frac:double> — dup_frac is NULL when the doc
    * has fewer than n tokens (no grams to judge), matching the HOF form
    * and the oracle's CASE WHEN. */
  val Out: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = true)))

  /** One pass: build each space-joined gram into a reused StringBuilder,
    * count first-occurrences via HashSet. Called from generated code. */
  def compute(arr: ArrayData, n: Int): InternalRow = {
    val m = arr.numElements()
    val total = m - n + 1
    if (total <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, null))
    val toks = new Array[String](m)
    var i = 0
    while (i < m) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) "" else t.toString
      i += 1
    }
    val seen = new java.util.HashSet[String](total * 2)
    var distinct = 0
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, (total - distinct).toDouble / total))
  }
}

/** Unicode NFC normalization as a native expression — the corpus-text
  * hygiene pass (mojibake from mixed crawl encodings, decomposed
  * accents from mac filesystems/OCR) every multilingual pre-training
  * pipeline runs before tokenization: the SAME logical character can
  * arrive as 'é' (U+00E9) or 'e'+U+0301 and would otherwise hash,
  * shingle, and tokenize as different text — silently defeating exact
  * dedup and splitting term statistics. Spark has no built-in
  * normalizer, so this wraps `java.text.Normalizer` (canonical
  * composition, the Unicode standard's NFC) as a codegen'd
  * UnaryExpression; the oracle twin is DuckDB's utf8proc-backed
  * `nfc_normalize` — both implement UAX #15, and the registry row
  * plants stable composition pairs (é-class) where the two Unicode
  * data versions cannot differ. Fast path: already-NFC text (the
  * overwhelming majority) is detected by `Normalizer.isNormalized`
  * (a scan, no allocation) and returned as-is. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftext.ColumnBridge.column(
      NfcNormalize(org.apache.spark.sql.graftext.ColumnBridge.expression(c)))
}

/** Native BPE encoder — the production-merge-count twin of
  * [[Bpe.encodeExpr]]'s literal-replace chain. The chain IS the oracle
  * semantics (one left-to-right non-overlapping pass per merge, in
  * rank order), but it builds one nested expression per merge: fine at
  * the oracle rows' 8 merges, impossible at a production tokenizer's
  * tens of thousands (plan size and codegen both blow up). This
  * expression walks the word's code-point symbols once per TOUCHED
  * merge — a symbol-presence set skips the merges whose pair can't
  * occur, which for natural words is almost all of them — inside one
  * codegen'd call, with the merge table embedded as a plan reference
  * object (driver-side constant, like the PQ codebook literals).
  * [[graft.BpeSpec]] pins native ≡ replace-chain on planted overlap
  * cases, multi-byte code points, and trained merges.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                     eow: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string, got $t")
  }

  @transient private lazy val table = new BpeEncode.MergeTable(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], table, eow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeEncode.MergeTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.compute($c, $ref, $eow);")
  }

  override protected def withNewChildInternal(c: Expression): BpeEncode =
    copy(child = c)
}

object BpeEncode {
  /** Rank-ordered merge table shipped into generated code as one
    * reference object. */
  final class MergeTable(val merges: Seq[(String, String)])
      extends Serializable {
    val xs: Array[String] = merges.map(_._1).toArray
    val ys: Array[String] = merges.map(_._2).toArray
    val outs: Array[String] = merges.map(m => m._1 + m._2).toArray
  }

  /** The replace-chain semantics on the symbol list: for each merge in
    * rank order, ONE left-to-right non-overlapping pass (i advances by
    * 2 over a merged pair). The presence set is a superset of the live
    * symbols (merged-away symbols are not evicted — a stale hit only
    * costs a no-op pass), so skipped merges provably cannot occur. */
  def compute(word: org.apache.spark.unsafe.types.UTF8String,
              t: MergeTable, eow: Boolean): ArrayData = {
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length min 16)
    val present = new java.util.HashSet[String]()
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val n = Character.charCount(cp)
      val sym = s.substring(ci, ci + n)
      syms.add(sym)
      present.add(sym)
      ci += n
    }
    // the opt-in end-of-word sentinel joins the symbol stream BEFORE
    // the empty-word special case: an empty word under eow is exactly
    // the sentinel symbol, matching the chain form's trim+split
    if (eow) { syms.add(graft.functions.Bpe.Sentinel)
               present.add(graft.functions.Bpe.Sentinel) }
    // split("", "  ") yields [""] — the chain form counts an empty word
    // as one empty symbol, so the native twin must too
    if (syms.isEmpty) syms.add("")
    var m = 0
    while (m < t.xs.length && syms.size > 1) {
      if (present.contains(t.xs(m)) && present.contains(t.ys(m))) {
        val x = t.xs(m); val y = t.ys(m)
        var merged = false
        val out = new java.util.ArrayList[String](syms.size)
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms.get(i) == x && syms.get(i + 1) == y) {
            out.add(t.outs(m)); merged = true; i += 2
          } else { out.add(syms.get(i)); i += 1 }
        }
        if (merged) { syms = out; present.add(t.outs(m)) }
      }
      m += 1
    }
    val arr = new Array[Any](syms.size)
    var i = 0
    while (i < syms.size) {
      arr(i) = org.apache.spark.unsafe.types.UTF8String.fromString(syms.get(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}
