package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time session windows + approximate distinct — streaming/agg
  * capabilities beyond the reference's surface.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window groups events within the gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF().toDF("ts", "user", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"user")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .select($"session_window.start".as("start"), $"user", $"n", $"s")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      (ts("2024-01-01 10:00:00"), "u1", 1.0),
      (ts("2024-01-01 10:03:00"), "u1", 2.0),   // same session (< 5 min gap)
      (ts("2024-01-01 10:20:00"), "u1", 4.0))   // new session
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 11:00:00"), "u1", 0.0)) // advance watermark
    q.processAllAvailable()
    val rows = spark.table("sessions").orderBy("start").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("s") == 3.0)
    assert(rows(1).getAs[Long]("n") == 1 && rows(1).getAs[Double]("s") == 4.0)
  }

  test("batch sessionAgg merges at exactly the gap, splits just past it") {
    // Spark merges sessions whose windows TOUCH (start <= prev end), so
    // an event exactly `gap` after the previous one stays in the same
    // session — the oracle twin must use `diff <= gap → same session`.
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "u1", 1.0),
      (ts("2024-01-01 10:05:00"), "u1", 2.0),  // EXACTLY the gap: merges
      (ts("2024-01-01 10:10:01"), "u1", 4.0),  // 1s past the gap: new session
      (ts("2024-01-01 10:00:00"), "u2", 16.0)  // other key: never merges
    ).toDF("ts", "user", "value")
    val got = graft.operators.Sessionize
      .sessionAgg(df, "ts", "5 minutes", Seq("user"),
        Seq(count(lit(1)).as("n"), sum($"value").as("s")))
      .orderBy("user", "session_start")
      .collect()
    assert(got.length == 3)
    val s1 = got(0)
    assert(s1.getAs[String]("user") == "u1" && s1.getAs[Long]("n") == 2
      && s1.getAs[Double]("s") == 3.0)
    // end = last event + gap, not first event + gap
    assert(s1.getAs[Timestamp]("session_end") == ts("2024-01-01 10:10:00"))
    val s2 = got(1)
    assert(s2.getAs[Long]("n") == 1 && s2.getAs[Double]("s") == 4.0
      && s2.getAs[Timestamp]("session_start") == ts("2024-01-01 10:10:01"))
    assert(got(2).getAs[String]("user") == "u2")
  }

  test("approx_count_distinct within 5% of exact on fixture keys") {
    val li = Tables.lineitem(spark, sf0001)
    val r = li.agg(
      countDistinct($"l_orderkey").as("exact"),
      approx_count_distinct($"l_orderkey", 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }
}
