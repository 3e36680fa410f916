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
  *    (order, value) pairs so partial merges are order-correct.
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
