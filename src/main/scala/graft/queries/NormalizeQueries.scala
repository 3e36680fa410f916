package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._
import graft.normalize.Normalize

/** SURVEY.md §2.7 normalize layer under oracle check. The reference's dirty
  * inputs (comma separators, NBSP, `dd/MM/yyyy`, `"x (y %)"` change
  * strings, JSON-in-string) don't exist in the driver fixtures, so each
  * query *constructs* the dirty shape deterministically from fixture
  * columns, then applies the expression-only normalize — both engine and
  * oracle build identical inputs, so the parse semantics are what is
  * compared. All stages are scalar expressions: zero shuffles, fully
  * codegen'd, pushdown-transparent.
  */
object NormalizeQueries {

  /** F1/F2: comma-and-space-corrupted numerics → float/long
    * (`util.py:41-49`; corpus patterns per FIXTURES.md A1, e.g.
    * `"750,800 "`, `"60,902,000,000 "`, NBSP-suffixed prices). */
  // Conditional parallelism unlock for the expression-only pipelines
  // below: a single-row-group local fixture scans as ONE partition, so
  // the per-row normalize expressions (regex, decimal formatting, date
  // parsing) would run on one core; at scale the file splits already
  // feed every core and the repartition is skipped (see
  // graft.functions.Parallelism).
  private def par(df: DataFrame): DataFrame =
    graft.functions.Parallelism.ensureParallel(df)

  def normalizeCast(s: SparkSession, d: String): DataFrame =
    par(lineitem(s, d)).select(
      col("l_orderkey"), col("l_linenumber"),
      concat(col("l_orderkey").cast(StringType), lit(","),
        lpad(col("l_linenumber").cast(StringType), 3, "0"), lit(" ")).as("dirty_long"),
      concat(lit(" "), col("l_quantity").cast("decimal(12,2)").cast(StringType),
        lit(" ")).as("dirty_float"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        Normalize.toLongCol(col("dirty_long")).as("parsed_long"),
        Normalize.toDoubleCol(col("dirty_float")).as("parsed_double"))

  /** F3/F4/F6: dd/MM/yyyy parse, +7h shift, epoch seconds
    * (`util.py:24-25,51-55,66`). */
  def normalizeDates(s: SparkSession, d: String): DataFrame = {
    val dmy = date_format(col("o_orderdate"), "dd/MM/yyyy")
    par(orders(s, d)).select(
      col("o_orderkey"),
      // cast the parsed date to timestamp: parquet date32 vs DuckDB DATE
      // canonicalize differently in pandas; timestamp is unambiguous
      Normalize.parseDateDMY(dmy).cast("timestamp").as("d_parsed"),
      Normalize.parseDateDMYPlus7h(dmy).as("ts_plus7h"),
      Normalize.dateToEpoch(dmy).as("epoch_s"))
  }

  /** F7: `"x (y %)"` change strings → fraction (`util.py:27-29`). */
  def normalizeChange(s: SparkSession, d: String): DataFrame =
    par(lineitem(s, d)).select(
      col("l_orderkey"), col("l_linenumber"),
      Normalize.convertChange(
        concat(lit("1.0 ("), (col("l_discount") * 100).cast("decimal(6,2)").cast(StringType),
          lit(" %)"))).as("change_frac"))

  /** F14/P8: JSON-in-string parse + struct flatten
    * (`warehouse.py:142-146`): from_json(props) → select(parsed.*). */
  def structFlatten(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).as("parsed"))
      .select(col("event_id"), col("parsed.*"))

  /** Semi-structured aggregation: extract props.k per event_type
    * (get_json_object path of F14). */
  def propsAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast(LongType)).as("sum_k"),
        avg(col("k")).as("avg_k"),
        max(col("k")).as("max_k"))

  /** News records constructed deterministically from `events` in the
    * reference's scrape shape (`producer.py:83-88`): epoch-millis STRING
    * time (hour-truncated so (title,time) keys actually collide and the
    * upsert has work to do), title/img derived from event columns. */
  private def newsRaw(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      concat(lit("News: "), col("event_type"), lit(" #"),
        (col("event_id") % 50).cast("string")).as("title"),
      concat(lit("https://example.com/"), col("event_type")).as("source"),
      concat(lit("img_"), (col("event_id") % 10).cast("string")).as("img"),
      unix_millis(date_trunc("hour", col("ts"))).cast("string").as("time"))

  /** News ingest: typed parse + (title,time) primary-key upsert
    * (`warehouse.py:93-100,188-196`). */
  def newsIngest(s: SparkSession, d: String): DataFrame =
    graft.ingest.NewsIngest.upserted(graft.ingest.NewsIngest.typed(newsRaw(s, d)))

  /** GET /news — latest 6 (`API.py:52-62`). */
  def newsRecent(s: SparkSession, d: String): DataFrame =
    graft.ingest.NewsIngest.recent(newsIngest(s, d), 6)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_normalize_cast"   -> (normalizeCast _),
    "q_normalize_dates"  -> (normalizeDates _),
    "q_normalize_change" -> (normalizeChange _),
    "q_struct_flatten"   -> (structFlatten _),
    "q_props_agg"        -> (propsAgg _),
    "q_news_ingest"      -> (newsIngest _),
    "q_news_recent"      -> (newsRecent _))

  val oracle: Map[String, String] = Map(
    "q_normalize_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(replace(replace(l_orderkey::VARCHAR || ',' || lpad(l_linenumber::VARCHAR, 3, '0') || ' ', ',', ''), ' ', '') AS BIGINT) AS parsed_long,
        |  CAST(replace(replace(replace(' ' || CAST(l_quantity AS DECIMAL(12,2))::VARCHAR || chr(160), ',', ''), ' ', ''), chr(160), '') AS DOUBLE) AS parsed_double
        |FROM lineitem""".stripMargin,
    "q_normalize_dates" ->
      """SELECT o_orderkey,
        |  CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS TIMESTAMP) AS d_parsed,
        |  CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS TIMESTAMP) + INTERVAL 7 HOUR AS ts_plus7h,
        |  CAST(epoch(CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS TIMESTAMP)) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin,
    "q_normalize_change" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(regexp_extract('1.0 (' || CAST(l_discount * 100 AS DECIMAL(6,2))::VARCHAR || ' %)', '\(\s*(-?[0-9.]+)\s*%\s*\)', 1) AS DOUBLE) / 100.0 AS change_frac
        |FROM lineitem""".stripMargin,
    "q_struct_flatten" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
        |FROM events""".stripMargin,
    "q_props_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS BIGINT) AS sum_k,
        |  avg(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS avg_k,
        |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_news_ingest" -> NewsOracleSql,
    "q_news_recent" ->
      (s"SELECT title, source, img, time FROM ($NewsOracleSql)\n" +
        "ORDER BY time DESC, title ASC LIMIT 6"))

  /** Shared news oracle: the same raw construction → typed parse →
    * (title,time) upsert the engine runs. */
  private lazy val NewsOracleSql: String =
    """WITH raw AS (SELECT
      |  concat('News: ', event_type, ' #', CAST(event_id % 50 AS VARCHAR)) AS title,
      |  concat('https://example.com/', event_type) AS source,
      |  concat('img_', CAST(event_id % 10 AS VARCHAR)) AS img,
      |  CAST(epoch_ms(date_trunc('hour', ts)) AS VARCHAR) AS time_s
      |FROM events),
      |typed AS (SELECT title, source, img,
      |                 epoch_ms(TRY_CAST(time_s AS BIGINT)) AS time FROM raw)
      |SELECT title, min(source) AS source, min(img) AS img, time
      |FROM typed GROUP BY title, time""".stripMargin
}
