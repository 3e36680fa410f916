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
}
