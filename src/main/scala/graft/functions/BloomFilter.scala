package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter semi-join reduction — the standard big-join pruning
  * technique (runtime filters in every warehouse engine): when BOTH join
  * sides are too large to broadcast as rows, the build side's KEY SET
  * still compresses into a few KB of bits, and probing those bits
  * map-side drops most non-matching fact rows BEFORE the shuffle the
  * exact join performs. Semantics are EXACT: a Bloom filter has no false
  * negatives, so the pre-filter never drops a matching row, and the
  * exact semi-join afterwards removes the false positives — the final
  * result is identical to the plain join, which is why the registry
  * query's oracle is ordinary semi-join SQL. (Anti-joins deliberately
  * have no Bloom path: a false positive would DROP a legitimate
  * anti-row, changing results.)
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over Spark's own XXH64
  * (`bit i = (h1 + i·h2) mod m`), identical in the aggregate's update
  * loop and the probe expression, so build and probe can never disagree.
  *
  * Scale shape: the build is ONE [[BloomLongAgg]] — a bounded m-bit
  * buffer with map-side partial aggregation (each partition ships m/8
  * bytes, merge is wordwise OR, fully order-independent); the collected
  * bits are O(KB) driver metadata (the k-means-centroid contract) that
  * re-enter the plan as an expression constant, so the probe is a pure
  * codegen'd map-side filter — no shuffle, no broadcast exchange, no
  * BNLJ against a one-row bits frame.
  */
object Bloom {

  /** Fixed double-hashing seeds — build and probe share them. */
  val Seed1 = 42L
  val Seed2 = 0x9E3779B97F4A7C15L // 2^64 / golden ratio: odd, well-mixed

  /** Set the k bit positions of `key` in `words`. */
  def setBits(words: Array[Long], key: Long, k: Int): Unit = {
    val m = words.length.toLong * 64
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      words((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** True iff every one of `key`'s k bit positions is set. */
  def mightContain(words: Array[Long], key: Long, k: Int): Boolean = {
    val m = words.length.toLong * 64
    val h1 = XXH64.hashLong(key, Seed1)
    val h2 = XXH64.hashLong(key, Seed2)
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Aggregate a long key column into Bloom words (array<long> of
    * `mBits`/64 elements). */
  def bloomAgg(key: Column, mBits: Int = 1 << 16, k: Int = 3): Column =
    ColumnBridge.column(
      BloomLongAgg(ColumnBridge.expression(key), mBits, k).toAggregateExpression())

  /** Probe literal Bloom words — a codegen'd boolean expression. */
  def contains(key: Column, words: Array[Long], k: Int = 3): Column =
    ColumnBridge.column(BloomContainsLong(ColumnBridge.expression(key), words, k))

  /** Bloom bits over a document set's distinct shingle hashes — the
    * build side of ingest-time decontamination
    * ([[graft.streaming.EventStream.curateDocStream]]). One bounded
    * aggregate over the (small, static) benchmark suite; O(KB) to the
    * driver. */
  def shingleBloom(bench: DataFrame, id: String, text: String,
                   n: Int = 5, mBits: Int = 1 << 16, k: Int = 3): Array[Long] =
    Dedup.shingles(bench, id, text, n)
      .select(bloomAgg(Dedup.md5Hash60(col("shingle")), mBits, k).as("w"))
      .collect()(0).getSeq[Long](0).toArray

  /** Bits per expected build-side key when auto-sizing: m ≈ 10·n at k=3
    * gives ≈ (1−e^{−0.3})³ ≈ 1.7% false-positive rate — real pruning,
    * cheap bits. */
  val AutoBitsPerKey: Int = 10

  /** Auto-size ceiling: 2²⁶ bits = 8 MB of driver metadata / codegen
    * reference object — past ~6.7M build keys the filter saturates
    * gracefully (pruning degrades, exact join keeps correctness) rather
    * than ballooning the plan. */
  val AutoMaxBits: Int = 1 << 26

  /** Smallest multiple of 64 ≥ `AutoBitsPerKey`·n, clamped to
    * [floor, [[AutoMaxBits]]]. */
  def sizedBits(nKeys: Long, floor: Int): Int = {
    val want = math.min(AutoMaxBits.toLong,
      math.max(floor.toLong, AutoBitsPerKey * nKeys))
    (((want + 63) / 64) * 64).toInt
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.Bloom")

  /** Exact semi-join of `fact` rows whose `factKey` appears in `dim`'s
    * `dimKey`, with the Bloom pre-filter pruning the fact side map-side
    * before the exact join's shuffle. Result is identical to the plain
    * semi-join by the no-false-negative guarantee.
    *
    * SIZING: `mBits` is a floor, not the final size. The build aggregate
    * also counts the build-side keys (same single job); if the count
    * needs more bits than `mBits` for a useful false-positive rate
    * (≈[[AutoBitsPerKey]] bits/key), the filter is REBUILT once at
    * [[sizedBits]] — without this, a fixed 2¹⁶-bit default saturates to
    * a ~40% false-positive rate at ~30k keys and the map-side pruning
    * silently degrades to a pass-through (correctness unaffected; the
    * exact semi-join always runs). The realized set-bit fraction is
    * logged either way so saturation is visible in ops. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    // INTEGRAL keys only: the long widening below is lossless for them,
    // which is what keeps the no-false-negative guarantee honest. A
    // string/decimal key would cast to null (or throw under ANSI) and
    // silently DROP matching rows — fail loudly at build time instead.
    def requireIntegral(df: DataFrame, name: String): Unit = {
      val t = df.schema(name).dataType
      require(t == types.LongType || t == types.IntegerType ||
          t == types.ShortType || t == types.ByteType,
        s"bloomSemiJoin needs an integral key, got $name: $t " +
          "(hash non-integral keys to a long — e.g. Dedup.md5Hash60 — first)")
    }
    requireIntegral(fact, factKey)
    requireIntegral(dim, dimKey)
    // ONE aggregate job over the build side's keys gets the bits AND a
    // DISTINCT-key estimate (mBits/8 bytes per partition to the final
    // OR-merge, then O(KB) to the driver); a second build job runs only
    // when the estimate shows the floor-size filter would saturate.
    // Distinct (approx HLL, ±2% — ample for a bits-per-key decision),
    // NOT count(*): a duplicate-heavy build side (10M rows over 5k keys)
    // sets only 5k keys' worth of bits, and a row count would trigger a
    // pointless full-size rebuild.
    val first = dim
      .select(bloomAgg(col(dimKey).cast("long"), mBits, k).as("w"),
        approx_count_distinct(col(dimKey)).as("n"))
      .head()
    val nKeys = first.getLong(1)
    val need = sizedBits(nKeys, mBits)
    val words =
      if (need <= mBits) first.getSeq[Long](0).toArray
      else dim.select(bloomAgg(col(dimKey).cast("long"), need, k).as("w"))
        .head().getSeq[Long](0).toArray
    val setFrac = words.map(java.lang.Long.bitCount(_).toLong).sum.toDouble /
      (words.length.toLong * 64)
    log.info(f"bloomSemiJoin: $nKeys%d build keys, ${words.length * 64}%d bits " +
      f"(floor $mBits%d), set-bit fraction $setFrac%.3f" +
      (if (setFrac > 0.5) " — SATURATED: pruning degraded, exact join still correct"
       else ""))
    fact.where(contains(col(factKey).cast("long"), words, k))
      .join(dim.select(col(dimKey).as("__bloom_key")).distinct(),
        col(factKey) === col("__bloom_key"), "left_semi")
  }
}

/** Bounded m-bit Bloom build buffer as one [[TypedImperativeAggregate]]:
  * update sets k bits per key, merge is wordwise OR — associative,
  * commutative, partitioning-independent, so the result is fully
  * deterministic. Null keys are skipped (SQL semantics: NULL joins
  * nothing). Same buffer/serialization discipline as [[KmvLongAgg]]. */
case class BloomLongAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1, s"Bloom needs k >= 1 hash functions, got $k")

  // analysis-time type enforcement (the probe twin BloomContainsLong has
  // the same rule): a non-long key would otherwise ClassCastException
  // mid-job inside update()
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected bigint key, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.setBits(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](mBits / 64)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): BloomLongAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomLongAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomLongAgg =
    copy(child = newChild)
}

/** `mightContain(key)` against DRIVER-LITERAL Bloom words — the probe
  * side of [[Bloom.bloomSemiJoin]]. The words array rides the expression
  * as a reference object (the [[NearestCentroid]] pattern), so the
  * filter is a pure map-side predicate inside whole-stage codegen — no
  * join, no broadcast variable plumbing. Null key → null (SQL-standard),
  * which a WHERE treats as drop. */
case class BloomContainsLong(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {

  require(words.nonEmpty, "BloomContainsLong needs a non-empty words array")

  // value-based equality over the array param (the r2-advisor rule for
  // coefficient-carrying expressions)
  override def equals(o: Any): Boolean = o match {
    case b: BloomContainsLong =>
      child == b.child && k == b.k && java.util.Arrays.equals(words, b.words)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, Integer.valueOf(k),
      Integer.valueOf(java.util.Arrays.hashCode(words)))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected bigint key, got $t")
  }

  override def nullSafeEval(key: Any): Any =
    Bloom.mightContain(words, key.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bloom.mightContain($wRef, $c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}
