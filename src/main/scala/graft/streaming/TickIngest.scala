package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.normalize.Normalize

/** T1/T2 — streaming tick ingest (SURVEY.md §2.8; reference
  * `pipeline/warehouse.py:113-165`, duplicated `test.py:8-59`):
  * Kafka source → `from_json(value, tickSchema)` → flatten → normalize →
  * lake append.
  *
  * The parse/normalize stage is a plain `DataFrame => DataFrame`, so the
  * SAME code runs on a batch frame (unit tests, backfill) and a streaming
  * frame (`readStream`) — Structured Streaming's incrementalization is
  * Catalyst's job, not ours. The reference's per-row Cassandra insert
  * (`test.py:42-51`, one connection per row inside the executor) becomes
  * `foreachBatch` + partitioned parquet append: per-micro-batch, columnar,
  * idempotent via (symbol, time) dedup inside the batch.
  */
object TickIngest {

  /** Kafka-shaped source → typed tick rows. Input contract: a `value`
    * column (binary or string) holding one JSON tick message
    * (FIXTURES.md A3). The reference's undefined-`schema` NameError
    * (`warehouse.py:143`) is resolved to the evident 11-field intent. */
  def parseTicks(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), Normalize.tickSchema).as("t"))
      .select(col("t.*"))
      .select(
        col("symbol"), col("time"),
        col("open"), col("high"), col("low"), col("close"),
        Normalize.toLongCol(col("volume")).as("volume"),
        Normalize.toDoubleCol(col("previous_close")).as("previous_close"),
        Normalize.toDoubleCol(col("ref")).as("ref"),
        Normalize.toDoubleCol(col("ceil")).as("ceil"),
        Normalize.toDoubleCol(col("floor")).as("floor"))

  /** Kafka streaming source (S3). Caller owns broker config; tests drive
    * [[parseTicks]] through MemoryStream instead of a broker. */
  def kafkaSource(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .load()

  /** S4 — Kafka sink framing (reference `producer.py:105-133` sent
    * Python-repr bytes; we standardize on JSON): any tick-shaped frame →
    * (key, value) Kafka frame, ready for `.write.format("kafka")` or
    * `writeStream.format("kafka")`. Keyed by symbol so one symbol's
    * messages stay ordered within a partition. */
  def toKafkaFrame(df: DataFrame): DataFrame =
    df.select(col("symbol").cast("string").as("key"),
      to_json(struct(df.columns.map(col): _*)).as("value"))

  /** T2 sink: micro-batch append to a symbol-partitioned lake path,
    * deduped on (symbol, time) within each batch (at-least-once upstream
    * becomes effectively-once per batch). */
  def startLakeSink(parsed: DataFrame, path: String, checkpoint: String,
                    trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.dropDuplicates("symbol", "time")
          .write.mode("append").partitionBy("symbol").parquet(path)
      }
      .start()
}
