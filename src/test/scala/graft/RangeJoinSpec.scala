package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed interval join: boundary semantics, multi-bucket intervals,
  * no duplicate matches, and the equi-join (not BNLJ) physical plan. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (1L, 100L, 250L),   // spans buckets 1..2 (width 100)
    (2L, 200L, 300L),   // [200, 300): touches buckets 2..2 (299 div 100)
    (3L, 950L, 1050L)   // crosses bucket boundary 9..10
  ).toDF("iv_id", "lo", "hi")

  private val points = Seq(
    (10L, 100L),  // == lo of iv 1: inclusive → match
    (11L, 249L),  // last position inside iv 1 (and inside iv 2)
    (12L, 250L),  // == hi of iv 1: exclusive → only iv 2
    (13L, 299L),  // inside iv 2
    (14L, 300L),  // == hi of iv 2: no match
    (15L, 1000L), // inside iv 3, in the bucket the interval ENTERS
    (16L, 50L)    // before everything: no match
  ).toDF("pt_id", "p")

  test("matches the naive range join exactly, each pair once") {
    val got = RangeJoin.bucketedRangeJoin(points, "p", intervals, "lo", "hi", 100L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = points.crossJoin(intervals)
      .where(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pt_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive)
    assert(got == Seq((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L), (13L, 2L), (15L, 3L)))
    // exactly-once: no dedup hidden in the comparison
    assert(got.distinct == got)
  }

  test("bucket width larger than every interval still finds cross-bucket matches") {
    val got = RangeJoin.bucketedRangeJoin(points, "p", intervals, "lo", "hi", 1000L)
      .select("pt_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((10L, 1L), (11L, 1L), (11L, 2L), (12L, 2L), (13L, 2L), (15L, 3L)))
  }

  test("plans as an equi-join on the bucket, not BNLJ/cartesian") {
    val plan = RangeJoin
      .bucketedRangeJoin(points, "p", intervals, "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
