package graft

import org.apache.spark.sql.functions._
import graft.operators.BucketedLayout

/** Behavior of the bucketed co-located layout
  * ([[graft.operators.BucketedLayout]]); the plan shapes (exchange-free
  * join/agg, 1-of-16 bucket pruning) are pinned in [[PlanQualitySpec]]
  * and the registry rows `q_bucket_join` / `q_bucket_lookup` are
  * DuckDB-oracled — this suite covers what those can't: layout
  * independence of results, orphan-location recovery, and the
  * pointLookup conf window. */
class BucketedLayoutSpec extends SparkSpec {

  private def warehousePath(table: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)

  test("co-bucketed join returns exactly the plain join's rows") {
    import spark.implicits._
    val left = Seq((1L, "a"), (2L, "b"), (3L, "c"), (17L, "q"))
      .toDF("k", "lv")
    val right = Seq((1L, 10), (3L, 30), (17L, 70), (99L, -1))
      .toDF("rk", "rv")
    BucketedLayout.writeBucketed(left, "graft_spec_l", "k", 4)
    BucketedLayout.writeBucketed(right, "graft_spec_r", "rk", 4)
    val bucketed = spark.table("graft_spec_l")
      .join(spark.table("graft_spec_r"), col("k") === col("rk"))
      .select("k", "lv", "rv").collect().toSet
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "lv", "rv").collect().toSet
    assert(bucketed == plain && plain.size == 3,
      s"bucketed=$bucketed plain=$plain")
    spark.sql("DROP TABLE graft_spec_l")
    spark.sql("DROP TABLE graft_spec_r")
  }

  test("writeBucketed recovers an orphaned warehouse location") {
    // a managed table's dir can outlive the in-memory catalog of the
    // JVM that wrote it (Verify/Bench runs share one warehouse dir);
    // the write must clear the unreadable orphan instead of failing
    // with LOCATION_ALREADY_EXISTS
    import spark.implicits._
    val t = "graft_spec_orphan"
    val loc = warehousePath(t)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc, "junk"))
    assert(!spark.catalog.tableExists(t))
    BucketedLayout.writeBucketed(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, "k", 4)
    assert(spark.table(t).count() == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("ensureBucketed builds once per session and pointLookup restores the conf") {
    import spark.implicits._
    val t = "graft_spec_ensure"
    var builds = 0
    def build = { builds += 1
      Seq((5L, "x"), (21L, "y"), (37L, "z")).toDF("k", "v") }
    BucketedLayout.ensureBucketed(spark, t, "k", 8)(build)
    BucketedLayout.ensureBucketed(spark, t, "k", 8)(build)
    assert(builds == 1, s"built $builds times, expected 1")
    val confKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val before = spark.conf.get(confKey)
    val lk = BucketedLayout.pointLookup(spark, t)(
      _.where(col("k") === 21L).select("k", "v"))
    assert(spark.conf.get(confKey) == before,
      "pointLookup must restore the autoBucketedScan conf")
    // the memoized plan is the pruned bucketed scan, and it executes
    val plan = lk.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(600))
    assert(lk.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((21L, "y")))
    spark.sql(s"DROP TABLE $t")
  }
}
