package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.queries.Analytics
import graft.streaming.TickIngest

/** E3 notebook analytics surface: explicit-schema CSV scan, range query
  * (DataFrame and SQL twins agree), describe, extremum; plus the S4
  * Kafka frame shape.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val csvPath = {
    val dir = Files.createTempDirectory("csvbars").toString
    val rows =
      "Ticker,DTYYYYMMDD,OpenFixed,HighFixed,LowFixed,CloseFixed,Volume" +:
      (1 to 30).map(i =>
        f"ACB,202301$i%02d,10.0,11.0,9.5,${10 + i % 5}.0,${1000 * i}") :+
      "FPT,20230115,80.0,81.0,79.0,80.5,5000"
    Files.write(java.nio.file.Paths.get(dir, "bars.csv"),
      String.join("\n", rows: _*).getBytes)
    dir
  }

  test("S2: CSV scan applies the explicit schema") {
    val df = Analytics.readCsvBars(spark, csvPath)
    assert(df.schema("CloseFixed").dataType.typeName == "double")
    assert(df.schema("Volume").dataType.typeName == "integer")
    assert(df.count() == 31)
  }

  test("barsBetween: range query, DataFrame and SQL twins agree") {
    val df = Analytics.readCsvBars(spark, csvPath)
    val a = Analytics.barsBetween(df, "20230110", "20230120", "CloseFixed", "ACB")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    val b = Analytics.barsBetweenSql(spark, df, "20230110", "20230120", "CloseFixed", "ACB")
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1)
    assert(a.length == 9)            // open interval: 11..19
    assert(a.sameElements(b))
    assert(!a.exists(_._1 == "20230115") || a.count(_._1 == "20230115") == 1) // FPT row excluded
  }

  test("describe and extremum match manual aggregates") {
    val df = Analytics.readCsvBars(spark, csvPath).where($"Ticker" === "ACB")
    val mx = Analytics.extremum(df, "Volume", isMax = true).head().getInt(0)
    val mn = Analytics.extremum(df, "Volume", isMax = false).head().getInt(0)
    assert(mx == 30000 && mn == 1000)
    val d = Analytics.summary(df, "CloseFixed").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d("count") == "30")
    assert(d("max").toDouble == 14.0)
  }

  test("percentilesApprox: inside the GK rank-error window of q_percentiles") {
    // the GK library twin's verifiable promise: approx_percentile(…,
    // acc) returns a REAL data value whose rank is within n/acc of the
    // target rank. Pin both the approx value and the exact interpolated
    // percentile inside the same order-statistic window [rank−slack,
    // rank+slack] per (group, p) on the fixture — the check an approx
    // operator can actually make (a DuckDB hash oracle cannot: the
    // sketch is engine-specific; the REGISTRY's exact bounded-memory
    // answer is q_percentiles_disc, which IS hash-oracled).
    import graft.queries.Relational
    val d = "/root/testdata/sf0.001"
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = toMap(Relational.percentiles(spark, d))
    val approx = toMap(Relational.percentilesApprox(spark, d))
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    val byGroup = graft.Tables.lineitem(spark, d)
      .select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
      .toMap
    for ((g, sorted) <- byGroup; (p, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val n = sorted.length
      val slack = math.max(1, math.ceil(n / 10000.0).toInt)
      val idx = p * (n - 1)
      val lo = sorted(math.max(0, math.floor(idx).toInt - slack))
      val hi = sorted(math.min(n - 1, math.ceil(idx).toInt + slack))
      val v = approx(g)(i)
      assert(v >= lo && v <= hi, s"group $g p$p: approx $v outside [$lo, $hi]")
      val e = exact(g)(i)
      assert(e >= lo && e <= hi, s"group $g p$p: exact $e outside [$lo, $hi]")
    }
  }

  test("S4: Kafka frame is (key, value-JSON) keyed by symbol") {
    val df = Seq(("FPT", 80.5, 750800L)).toDF("symbol", "close", "volume")
    val frame = TickIngest.toKafkaFrame(df)
    assert(frame.columns.toSeq == Seq("key", "value"))
    val r = frame.head()
    assert(r.getString(0) == "FPT")
    val v = r.getString(1)
    assert(v.contains("\"symbol\":\"FPT\"") && v.contains("\"volume\":750800"))
  }
}
