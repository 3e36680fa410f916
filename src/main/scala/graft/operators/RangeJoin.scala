package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval (range) join: points ⋈ intervals on
  * `lo <= point < hi` with no equi-key.
  *
  * Spark plans a bare range predicate as BroadcastNestedLoopJoin (or a
  * CartesianProduct when neither side broadcasts) — O(|P|·|I|) work that
  * this repo's plan gate ([[graft.PlanQualitySpec]]) rejects outright.
  * The standard scalable formulation (used by every distributed range-join
  * implementation, e.g. the interval-binning in genomics joins) instead
  * quantizes the position domain into fixed-width buckets: each interval
  * explodes to the buckets it covers, each point maps to its single
  * bucket, and bucket equality turns the plan into a plain shuffled
  * EQUI-join with the exact range predicate as a post-join filter. Cost is
  * `matches + same-bucket near-misses`, never |P|·|I|.
  *
  * A (point, interval) match is emitted exactly once — the point lives in
  * exactly one bucket — so no post-join dedup is needed.
  *
  * Bucket width tuning at scale: width ≈ the typical interval length is
  * the sweet spot — a narrow bucket multiplies the interval side by
  * (hi-lo)/width exploded rows; a wide bucket funnels distant points into
  * the same bucket (join amplification without matches). Degenerate hot
  * buckets (e.g. all intervals overlap one epoch) shuffle-skew like any
  * hot key; AQE skew-join splitting applies because the plan is a plain
  * equi-join.
  */
object RangeJoin {

  /** @param points    relation with a numeric position column
    * @param pointCol  position column name (non-negative long, e.g. epoch µs)
    * @param intervals relation with [lo, hi) numeric bounds, hi exclusive
    * @param loCol     interval lower bound (inclusive), non-negative long
    * @param hiCol     interval upper bound (exclusive), > lo
    * @param bucketWidth  quantization width in position units
    * @return points ⋈ intervals rows (all columns from both sides) where
    *         `lo <= point < hi`
    *
    * Positions must be non-negative (`div` truncates toward zero, which
    * is floor only for non-negative operands — epoch micros qualify).
    */
  def bucketedRangeJoin(points: DataFrame, pointCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val pb = "_rj_point_bucket"
    val ib = "_rj_interval_bucket"
    val p = points.withColumn(pb, expr(s"$pointCol div $bucketWidth"))
    // hi is exclusive: an interval ending exactly on a bucket boundary
    // does not cover that bucket, hence (hi - 1) div w as the last bucket
    val i = intervals.withColumn(ib,
      explode(sequence(expr(s"$loCol div $bucketWidth"),
        expr(s"($hiCol - 1) div $bucketWidth"))))
    p.join(i, col(pb) === col(ib) &&
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(pb, ib)
  }
}
