package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.normalize.Normalize

/** News-table pipeline: the reference scrapes articles into records
  * `{title, source, img, time}` with `time` an epoch-millis STRING
  * (`producer.py:83-88` appends "000" to a seconds `data-time`), ships
  * them through Kafka, and upserts into a NEWS table keyed
  * `(TITLE, TIME)` (`warehouse.py:93-100,188-196`); `GET /news` serves
  * the most recent handful (`API.py:52-62`).
  *
  * Engine equivalents, batch-shaped and fully distributed:
  *   - [[typed]]   — epoch-millis-string → timestamp parse onto
  *                   [[Normalize.newsSchema]] field names
  *   - [[upserted]] — one row per (title, time): the batch analog of the
  *                   Cassandra primary-key upsert. Aggregation, not a
  *                   full-row window sort: only the key + the two min
  *                   payloads shuffle.
  *   - [[recent]]  — latest-n serving scan (time desc, title asc
  *                   tie-break so limit is deterministic).
  */
object NewsIngest {

  /** Raw string records → typed rows. Malformed `time` strings become
    * null timestamps (try-cast), mirroring the tick-parse tolerance. */
  def typed(raw: DataFrame): DataFrame = {
    val fields = Normalize.newsSchema.fieldNames
    require(fields.forall(raw.columns.contains),
      s"news input must have columns ${fields.mkString(",")}")
    raw.select(col("title"), col("source"), col("img"),
      timestamp_millis(expr("try_cast(time AS BIGINT)")).as("time"))
  }

  /** Batch upsert semantics of the (TITLE, TIME) primary key: one row
    * per key; payload columns resolve deterministically (min) instead of
    * by arrival order, so the operator is idempotent and oracle-checkable. */
  def upserted(news: DataFrame): DataFrame =
    news.groupBy("title", "time")
      .agg(min("source").as("source"), min("img").as("img"))
      .select("title", "source", "img", "time")

  /** GET /news — latest `n` articles. */
  def recent(news: DataFrame, n: Int): DataFrame =
    news.orderBy(col("time").desc, col("title").asc).limit(n)

  /** JSON at the API edge (the reference returns `df.to_json()`
    * frames): one JSON document per row, collected only at the serving
    * boundary — never inside a query. */
  def toJsonRows(df: DataFrame): Dataset[String] = df.toJSON

  /** Kafka-shaped news message → typed rows: the producer ships a JSON
    * array of articles per message (`producer.py:89-104` batches the
    * scrape; `warehouse.py:190-196` iterates it). `explode` undoes the
    * batching; [[typed]] parses each article. */
  def parseNewsMessages(raw: DataFrame): DataFrame =
    typed(raw
      .select(from_json(col("value").cast("string"),
        org.apache.spark.sql.types.ArrayType(Normalize.newsSchema)).as("arr"))
      .select(explode(col("arr")).as("n"))
      .select(col("n.*")))

  /** Streaming upsert sink: per micro-batch, dedupe on the (title, time)
    * primary key and append to the lake — the batch-local analog of the
    * reference's per-row Cassandra upsert loop, minus the per-row
    * connection. Cross-batch duplicates resolve at read time via
    * [[upserted]] (idempotent), so at-least-once delivery is safe. */
  def startNewsSink(parsed: DataFrame, path: String, checkpoint: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger
                        .ProcessingTime("900 seconds")) // news cadence, run_pipeline.py:16
      : org.apache.spark.sql.streaming.StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upserted(batch).write.mode("append").parquet(path)
      }
      .start()
}
