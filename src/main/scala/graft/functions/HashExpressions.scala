package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd md5→60-bit-long hash: the oracle-parity hash of the
  * dedup family ([[Dedup.md5Hash60]]) as ONE expression.
  *
  * Value contract: identical to
  * `conv(substring(md5(s), 1, 15), 16, 10) cast long` — i.e. the first 15
  * hex chars of the md5 digest read as a base-16 number (what DuckDB's
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)` computes) — but skips
  * the hex-string render, `substring`, and `conv`'s char-by-char base
  * parse, and reuses a thread-local `MessageDigest` instead of
  * allocating one per row (the built-in `md5` goes through
  * commons-codec's per-call `getInstance`). Measured ~4× faster on the
  * shingle corpus; per-row cost is what a 100 TB shingle scan is made of.
  *
  * The first 15 hex chars are the first 60 BITS of the digest: big-endian
  * first 8 bytes, logically shifted right 4 — always non-negative and
  * < 2⁶⁰, so downstream ×/+ against 31-bit universal-hash coefficients
  * stays exact in signed 64-bit arithmetic (see [[Dedup.P]]).
  */
case class Md5Long60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long60 expects a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    Md5Long60.hash60(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long60.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

/** The full MinHash row-hash step fused into ONE expression:
  * `out[i] = (as[i] · (md5_60(s) mod P) + bs[i]) mod P` for i < k.
  *
  * Semantically identical to a `CreateArray` of k arithmetic
  * subexpressions over [[Md5Long60]] — but that form makes Janino
  * compile k copies of the multiply-add-mod chain (hundreds of ms of
  * codegen per plan) and evaluates k boxed subexpressions per row; this
  * compiles to one short static call with a primitive loop. Coefficients
  * ride along as reference objects, not literals, so the generated class
  * is the same size for any k.
  */
case class MinhashHashes(child: Expression, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "coefficient arrays must match and be non-empty")

  // Array params compare by reference under case-class equals, which
  // would make semantically identical instances unequal and defeat
  // canonicalization / subexpression elimination / exchange reuse.
  override def equals(o: Any): Boolean = o match {
    case m: MinhashHashes =>
      child == m.child && p == m.p &&
        java.util.Arrays.equals(as, m.as) && java.util.Arrays.equals(bs, m.bs)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, java.lang.Long.valueOf(p),
      Integer.valueOf(java.util.Arrays.hashCode(as)),
      Integer.valueOf(java.util.Arrays.hashCode(bs)))

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_hashes expects a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    MinhashHashes.compute(v.asInstanceOf[UTF8String].getBytes, as, bs, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashHashes.compute($c.getBytes(), $asRef, $bsRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashHashes =
    copy(child = newChild)
}

object MinhashHashes {
  def compute(bytes: Array[Byte], as: Array[Long], bs: Array[Long], p: Long)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = Md5Long60.hash60(bytes) % p
    val out = new Array[Long](as.length)
    var i = 0
    while (i < as.length) { out(i) = (as(i) * h + bs(i)) % p; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column, as: Array[Long], bs: Array[Long], p: Long): Column =
    ColumnBridge.column(MinhashHashes(ColumnBridge.expression(c), as, bs, p))
}

/** SimHash ±1 bit votes fused into ONE expression: `out[b] = bit b of
  * md5_60(s) == 1 ? 1 : -1` for b < bits — replaces a `CreateArray` of
  * `bits` conditional subexpressions (same Janino-bloat story as
  * [[MinhashHashes]]).
  */
case class SimhashVotes(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 60, s"simhash_votes needs bits in [1,60], got $bits")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_votes expects a string argument, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    SimhashVotes.compute(v.asInstanceOf[UTF8String].getBytes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashVotes.compute($c.getBytes(), $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashVotes =
    copy(child = newChild)
}

object SimhashVotes {
  def compute(bytes: Array[Byte], bits: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = Md5Long60.hash60(bytes)
    val out = new Array[Long](bits)
    var b = 0
    while (b < bits) { out(b) = if (((h >>> b) & 1L) == 1L) 1L else -1L; b += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(c: Column, bits: Int): Column =
    ColumnBridge.column(SimhashVotes(ColumnBridge.expression(c), bits))
}

object Md5Long60 {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a non-negative long. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  def apply(c: Column): Column = ColumnBridge.column(Md5Long60(ColumnBridge.expression(c)))

  /** Register `md5_long60` for `spark.sql` users. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long60", es => Md5Long60(es.head), "scala_udf")
}
