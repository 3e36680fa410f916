package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact recursive exponentially-weighted moving average — the one
  * computation in the reference not expressible as a stock batch
  * expression (SURVEY.md §2.4 A5; reference `pipeline/util/util.py:107-116`
  * pandas `ewm`, deleted `compute.py` remnant).
  *
  * Two forms:
  *  - [[perRow]]: per-key ordered fold emitting EMA for every row —
  *    `repartition(key) → sortWithinPartitions(key, order) →
  *    mapPartitions` with O(1) state per key. Exact for unbounded series
  *    (unlike the closed-form window, which is double-range-limited), one
  *    shuffle, streaming-friendly (same fold drives the stateful
  *    streaming path).
  *  - [[EwmaAgg]]: an `Aggregator[(Long, Double), _, Double]` usable in
  *    `groupBy(...).agg(...)` returning the final EMA per key; buffers
  *    (order, value) pairs so partial merges are order-correct —
  *    bounded, loud-failing past [[EwmaAggMaxRowsPerKey]].
  *  - [[emaSegmented]]: the final-EMA-per-key shape WITHOUT the
  *    full-series buffer — a two-level segmented scan over composed
  *    affine maps, O(chunk) memory at any series length.
  */
object Ewma {

  /** Streaming fold: seed = first value, then E = α·x + (1-α)·E. */
  def fold(alpha: Double)(values: Iterator[Double]): Iterator[Double] = {
    var state = Double.NaN
    values.map { x =>
      state = if (state.isNaN) x else alpha * x + (1 - alpha) * state
      state
    }
  }

  /** Per-row exact EMA. Requires `key` and a numeric/orderable `ord`
    * column; appends `as` (double). One hash shuffle on `key`, then a
    * per-partition sorted scan — rows of one key never split across
    * partitions, so the fold is exact.
    */
  def perRow(df: DataFrame, value: String, n: Int, key: Seq[String],
             ord: Seq[String], as: String = "ema_exact"): DataFrame = {
    val alpha = 2.0 / (n + 1.0)
    val outSchema = StructType(df.schema.fields :+ StructField(as, DoubleType))
    val keyIdx = key.map(df.schema.fieldIndex)
    val valIdx = df.schema.fieldIndex(value)
    val enc = RowEncoder.encoderFor(outSchema)
    df.repartition(key.map(col): _*)
      .sortWithinPartitions((key ++ ord).map(col): _*)
      .mapPartitions { rows =>
        var curKey: Seq[Any] = null
        var state = Double.NaN
        rows.map { row =>
          val k = keyIdx.map(row.get)
          if (k != curKey) { curKey = k; state = Double.NaN }
          row.getAs[Any](valIdx) match {
            // pandas-ewm null semantics: a null observation emits the
            // prior state unchanged (null before any observation) —
            // it must NOT reset or poison the fold
            case null =>
              Row.fromSeq(row.toSeq :+ (if (state.isNaN) null else state))
            case v: Number =>
              val x = v.doubleValue()
              state = if (state.isNaN) x else alpha * x + (1 - alpha) * state
              Row.fromSeq(row.toSeq :+ state)
          }
        }
      }(enc)
  }

  /** Default per-key row bound for [[EwmaAgg]]: 16 bytes × 2²² ≈ 67 MB
    * of unspillable buffer per key — loud failure well before an
    * executor-level OOM. */
  val EwmaAggMaxRowsPerKey: Long = 1L << 22

  /** Final EMA per key via a TWO-LEVEL SEGMENTED SCAN — the
    * bounded-memory form of [[EwmaAgg]] for series of ANY length. The
    * EMA step is the affine map E ↦ (1−α)·E + α·x, and affine maps
    * compose associatively, so a chunk `[x₁…x_m]` summarizes to
    * (a, b, y): `a = (1−α)^m` (how much incoming state survives the
    * chunk), `b` the composed offset, and `y` the chunk's SEEDED result
    * (the state after the chunk when its first observation seeds).
    * Level 1 folds each (key, chunk)'s sorted observations into that
    * summary; level 2 composes summaries in chunk order — the first
    * chunk contributes `y`, every later chunk maps `y ↦ aᵢ·y + bᵢ`.
    *
    * Mathematically exact (associativity is exact in the reals; doubles
    * re-associate, so results agree with the sequential fold to ulps —
    * the property spec pins ≤ 1e-10 relative). Memory: level 1 buffers
    * one CHUNK's rows, level 2 one key's CHUNK COUNT — vs [[EwmaAgg]]'s
    * full-series buffer, which hard-fails past [[EwmaAggMaxRowsPerKey]].
    * Both folds are `aggregate(array_sort(collect_list(…)))` — stock
    * codegen'd expressions, no UDAF, two ordinary spillable-shuffle
    * aggregations in the plan.
    *
    * `chunk = floor(ord / chunkWidth)` — any monotone-in-ord binning
    * works; width ≈ √(rows per key) balances the levels. Rows with null
    * value or null ord are identity maps and are dropped up front
    * (pandas-ewm null semantics for the FINAL state). `ord` must be
    * integral and unique per key (ties would fold in array order, which
    * a buffer-order-dependent [[EwmaAgg]] does not define either).
    * Output: key columns + `as`, one row per key. */
  def emaSegmented(df: DataFrame, value: String, n: Int, key: Seq[String],
                   ord: String, chunkWidth: Long = 1L << 16,
                   as: String = "ema"): DataFrame = {
    require(chunkWidth >= 1, s"chunkWidth must be >= 1, got $chunkWidth")
    require(key.nonEmpty, "emaSegmented needs >= 1 key column")
    val alpha = 2.0 / (n + 1.0)
    val keep = lit(1.0 - alpha)
    val obs = struct(col(ord).cast("long").as("o"),
      col(value).cast("double").as("x"))
    val summaries = df
      .where(col(value).isNotNull && col(ord).isNotNull)
      .withColumn("__chunk", floor(col(ord).cast("long") / chunkWidth))
      .groupBy(key.map(col) :+ col("__chunk"): _*)
      .agg(array_sort(collect_list(obs)).as("__arr"))
      .select(key.map(col) :+ col("__chunk") :+ aggregate(
        col("__arr"),
        struct(lit(1.0).as("a"), lit(0.0).as("b"),
          lit(null).cast("double").as("y")),
        (acc, e) => struct(
          (acc("a") * keep).as("a"),
          (acc("b") * keep + lit(alpha) * e("x")).as("b"),
          when(acc("y").isNull, e("x"))
            .otherwise(lit(alpha) * e("x") + keep * acc("y")).as("y")))
        .as("__s"): _*)
    summaries
      .groupBy(key.map(col): _*)
      .agg(array_sort(collect_list(struct(col("__chunk").as("o"),
        col("__s.a").as("a"), col("__s.b").as("b"), col("__s.y").as("y"))))
        .as("__cs"))
      .select(key.map(col) :+ aggregate(
        col("__cs"),
        lit(null).cast("double"),
        (acc, s) => when(acc.isNull, s("y"))
          .otherwise(s("a") * acc + s("b"))).as(as): _*)
  }

  /** Final-EMA-per-key typed aggregator. Buffers (ord, value) pairs and
    * sorts at reduce boundaries, so it is correct under Spark's partial
    * aggregation (merge of unordered partials).
    *
    * MEMORY BOUND — ENFORCED: the buffer is the key's ENTIRE (ord, value)
    * series (O(16 bytes × rows-per-key) on one executor; it does not
    * spill — the price of order-correct merging inside an unordered
    * aggregate). The aggregator counts buffered rows (O(1), carried in
    * the buffer) and THROWS with a clear message once a key exceeds
    * `maxRowsPerKey` (default [[EwmaAggMaxRowsPerKey]] ≈ 4.2M rows
    * ≈ 67 MB) instead of letting a giant key take down the executor.
    * Use this form for many-keys/short-series shapes (daily bars per
    * symbol); for giant single-key series use [[perRow]], whose state is
    * O(1) per key and whose sort is Spark's own spillable partition
    * sort — the numbers agree exactly ([[graft.IndicatorsSpec]]
    * long-series property).
    */
  class EwmaAgg(alpha: Double, maxRowsPerKey: Long = EwmaAggMaxRowsPerKey)
      extends Aggregator[(Long, Double), (Long, List[(Long, Double)]), Double] {
    private def check(n: Long): Long = {
      if (n > maxRowsPerKey) throw new IllegalStateException(
        s"EwmaAgg buffered $n rows for one key (bound $maxRowsPerKey): the " +
          "buffer is unspillable — use Ewma.perRow (O(1) state, spillable " +
          "sort) for long single-key series, or raise maxRowsPerKey")
      n
    }
    override def zero: (Long, List[(Long, Double)]) = (0L, Nil)
    override def reduce(b: (Long, List[(Long, Double)]), a: (Long, Double)) =
      (check(b._1 + 1), a :: b._2)
    override def merge(b1: (Long, List[(Long, Double)]), b2: (Long, List[(Long, Double)])) =
      (check(b1._1 + b2._1), b1._2 ::: b2._2)
    override def finish(b: (Long, List[(Long, Double)])): Double = {
      val it = fold(alpha)(b._2.sortBy(_._1).iterator.map(_._2))
      var last = Double.NaN
      while (it.hasNext) last = it.next()
      last
    }
    override def bufferEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, List[(Long, Double)])]()
    override def outputEncoder = Encoders.scalaDouble
  }
}
