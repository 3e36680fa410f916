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
