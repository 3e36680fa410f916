package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import graft.ingest.NewsIngest

/** News pipeline semantics: epoch-millis-string parse (with malformed
  * tolerance), (title,time) upsert, recent-n serving, JSON edge.
  */
class NewsIngestSpec extends SparkSpec {
  import spark.implicits._

  private def raw = Seq(
    ("A", "s1", "i1", "1700000000000"),
    ("A", "s0", "i2", "1700000000000"), // same (title,time) → upsert merges
    ("B", "s2", "i3", "1700000360000"),
    ("C", "s3", "i4", "not-a-number")   // malformed time → null ts
  ).toDF("title", "source", "img", "time")

  test("typed parses epoch-millis strings; malformed becomes null") {
    val t = NewsIngest.typed(raw).collect().map(r => r.getString(0) -> r.get(3)).toMap
    assert(t("A") === Timestamp.from(java.time.Instant.ofEpochMilli(1700000000000L)))
    assert(t("C") === null)
  }

  test("upserted keeps one row per (title,time) with min payloads") {
    val up = NewsIngest.upserted(NewsIngest.typed(raw))
    assert(up.count() === 3)
    val a = up.where($"title" === "A").head()
    assert(a.getString(1) === "s0" && a.getString(2) === "i1")
  }

  test("recent returns latest-n in (time desc, title) order") {
    val up = NewsIngest.upserted(NewsIngest.typed(raw))
    val top = NewsIngest.recent(up.where($"time".isNotNull), 2)
      .collect().map(_.getString(0)).toSeq
    assert(top === Seq("B", "A"))
  }

  test("toJsonRows emits one parseable JSON document per row") {
    val js = NewsIngest.toJsonRows(
      NewsIngest.upserted(NewsIngest.typed(raw))).collect()
    assert(js.length === 3)
    assert(js.forall(s => s.startsWith("{") && s.contains("\"title\":")))
  }

  test("streaming path: batched Kafka message -> typed rows -> upsert sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("newslake").toString
    val mem = MemoryStream[String]
    val parsed = NewsIngest.parseNewsMessages(mem.toDF().toDF("value"))
    val q = NewsIngest.startNewsSink(parsed, s"$dir/lake", s"$dir/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    // one producer message = a JSON ARRAY of articles (batched scrape),
    // with an in-batch duplicate (title,time) key
    mem.addData(
      """[{"title":"A","source":"s1","img":"i1","time":"1700000000000"},
         |{"title":"A","source":"s0","img":"i2","time":"1700000000000"},
         |{"title":"B","source":"s2","img":"i3","time":"1700000360000"}]""".stripMargin)
    q.processAllAvailable()
    q.stop()
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.count() === 2) // in-batch upsert collapsed the dup title
    val a = lake.where(col("title") === "A").head()
    assert(a.getAs[String]("source") === "s0")
  }
}
