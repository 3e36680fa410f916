package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) physical layout for MULTI-column range
  * pruning — the complement of [[BucketedLayout]] (key-equality
  * co-location): interleaving the bits of N quantized sort keys makes
  * rows that are close in EVERY dimension land close in the file order,
  * so parquet row-group min/max statistics stay tight on ALL N columns
  * at once. A plain `sortBy(a)` layout prunes range scans on `a` and
  * nothing else; the z-ordered layout prunes range scans on `a` OR `b`
  * (each at ~the √-locality of the curve), which is what a 100 TB fact
  * table queried along two independent dimensions (ship date × price
  * band, user × time, lat × lon) needs. Delta/Iceberg OPTIMIZE ZORDER
  * is this exact idea; here it is plain Spark + parquet: quantize,
  * interleave, range-repartition on z, sort within partitions by z.
  *
  * Everything is native Column arithmetic (shift/and/or — whole-stage
  * codegen), no UDF; the only extra write-time cost is one min/max
  * aggregate per key column (driver-collected, 2N doubles) and the
  * range exchange any clustered rewrite pays.
  *
  * The pruning mechanics at read time are parquet's own: predicate
  * pushdown consults each row group's min/max for the ORIGINAL columns
  * — no z-value appears in any query; the curve only dictates physical
  * row placement. So readers need zero special support (`spark.read
  * .parquet` + a plain WHERE), and results are layout-independent
  * (`q_zorder_scan`'s oracle recomputes from the unsorted table).
  */
object ZOrderLayout {

  /** Bits per key column: 2 cols → 16 bits each (32-bit z), 3 → 10.
    * Enough for row-group-level locality — a row group holds ~10⁵-10⁶
    * rows, so sub-bucket order inside one z cell never matters. */
  def bitsFor(nCols: Int): Int = math.min(16, 60 / math.max(nCols, 1))

  /** Quantize `c` into [0, 2^bits) given its observed [lo, hi] range —
    * rank-space scaling with clamping, monotone by construction (ties
    * collapse to the same cell, which only loosens locality, never
    * correctness: pruning reads the original column stats). */
  private def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = (1L << bits) - 1
    val span = if (hi > lo) hi - lo else 1.0
    least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * lit(cells.toDouble))
        .cast("long")))
  }

  /** Bit-interleave N quantized values into one z-value: bit b of
    * column i lands at position b·N + i. A bits×N unrolled shift/and/or
    * expression — verbose in the plan, but pure integer arithmetic
    * inside whole-stage codegen. */
  private def interleave(qs: Seq[Column], bits: Int): Column =
    (for {
      b <- 0 until bits
      (q, i) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)),
        b * qs.size + i))
      .reduce(_.bitwiseOR(_))

  /** The z-value expression for `keys` over the given per-column
    * [lo, hi] ranges (exposed for specs; [[writeZOrdered]] computes the
    * ranges itself). */
  def zValue(keys: Seq[Column], ranges: Seq[(Double, Double)]): Column = {
    require(keys.nonEmpty && keys.size == ranges.size)
    val bits = bitsFor(keys.size)
    interleave(keys.zip(ranges).map { case (k, (lo, hi)) =>
      quantize(k, lo, hi, bits) }, bits)
  }

  /** Rewrite `df` as a z-ordered parquet layout on `keyCols`:
    * one min/max aggregate per key (a 2N-double driver collect),
    * `repartitionByRange(files, z)` so each output file owns a
    * contiguous z-range, `sortWithinPartitions(z)` so row groups INSIDE
    * a file are z-contiguous too — min/max tightness at both file and
    * row-group granularity. The z column itself is dropped before the
    * write: the layout is invisible to readers. */
  def writeZOrdered(df: DataFrame, path: String, keyCols: Seq[String],
                    files: Int = 16): Unit = {
    require(keyCols.nonEmpty, "z-order needs at least one key column")
    val mmExprs = keyCols.flatMap(c => Seq(min(col(c)).cast("double"),
      max(col(c)).cast("double")))
    val mm = df.agg(mmExprs.head, mmExprs.tail: _*).head()
    val ranges = keyCols.indices.map(i => (mm.getDouble(2 * i),
      mm.getDouble(2 * i + 1)))
    df.withColumn("__z", zValue(keyCols.map(col), ranges))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
