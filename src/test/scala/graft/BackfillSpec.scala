package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ingest.BarsIngest
import graft.operators.Skew

/** E1 golden end-to-end (SURVEY §5 item 3): multi-symbol backfill from
  * the reference's bundled JSON through normalize + indicators into the
  * partitioned lake, then serving reads with partition pruning; plus the
  * salted-join equivalence check.
  */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private val refData = "/root/reference/data/data_olhc"

  test("E1 backfill: 3 symbols -> partitioned lake, pruned serving reads") {
    assume(new java.io.File(s"$refData/FPT.json").exists())
    val out = Files.createTempDirectory("lake").toString + "/historical"
    BarsIngest.backfill(spark,
      Map("FPT" -> s"$refData/FPT.json",
          "VNM" -> s"$refData/VNM.json",
          "SSI" -> s"$refData/SSI.json"), out)
    // physical layout: one directory per symbol partition
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("symbol=FPT", "symbol=VNM", "symbol=SSI"))
    val lake = spark.read.parquet(out)
    assert(lake.count() == 3 * 2382)
    // serving query: per-symbol history is partition-pruned
    val hist = lake.where($"symbol" === "FPT")
      .orderBy($"date".desc).limit(20)
    val plan = hist.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(symbol"),
      s"expected partition pruning in:\n$plan")
    assert(hist.count() == 20)
    // indicator sanity on the lake: RSI bounded, no null ema after fill
    assert(lake.where($"rsi" < 0 || $"rsi" > 100).count() == 0)
    assert(lake.where($"ema".isNull).count() == 0)
  }

  test("saltedJoin equals plain join for skewed keys") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) "COLD" + i else "HOT", i))
      .toDF("k", "v")
    val small = Seq(("HOT", 1.0), ("COLD10", 2.0)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).agg(sum($"v" * $"w")).head().getDouble(0)
    val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 8)
      .agg(sum($"v" * $"w")).head().getDouble(0)
    assert(plain == salted)
  }
}
