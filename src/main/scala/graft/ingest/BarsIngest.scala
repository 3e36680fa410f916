package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.normalize.Normalize._
import graft.operators.Indicators

/** E1 — the batch backfill pipeline (SURVEY.md §3 E1; reference
  * `to_db.py:40-56` + `pipeline/util/util.py:57-74`): raw multiline-JSON
  * OLHC bars → dedup → typed normalize (expression-only, no UDFs) →
  * per-symbol indicators (change, EMA, RSI) → partitioned lake table.
  *
  * The reference ran this per-symbol with `collect()` + per-row Cassandra
  * INSERTs (`to_db.py:51-55`); here it is one declarative plan ending in a
  * distributed partitioned-parquet write — at 100 TB the only shuffles are
  * the initial symbol repartition (serving the window functions) and the
  * write's partitioning, and no row ever visits the driver.
  */
object BarsIngest {

  /** S1: multiline JSON array scan, schema inferred (`util.py:63`). */
  def readRawBars(spark: SparkSession, path: String, symbol: String): DataFrame =
    spark.read.option("multiline", "true").json(path)
      .withColumn("symbol", lit(symbol))

  /** Normalize the all-string raw bars into the typed bar schema
    * (`util.py:57-74`): dropDuplicates → date parse → numeric casts → sort.
    */
  def normalizeBars(raw: DataFrame): DataFrame =
    raw.dropDuplicates()
      .select(
        col("symbol"),
        parseDateDMY(col("date")).as("date"),
        toFloatCol(col("open")).as("open"),
        toFloatCol(col("high")).as("high"),
        toFloatCol(col("low")).as("low"),
        toFloatCol(col("close")).as("close"),
        toLongCol(col("volume")).as("volume"),
        toLongCol(col("value")).as("value"))

  /** Indicator enrichment (`to_db.py:44-49`): change + EMA(25) + RSI(25),
    * all over one symbol-keyed shuffle, then null-fill like the reference.
    */
  def enrich(bars: DataFrame, n: Int = 25): DataFrame = {
    val key = Seq("symbol")
    val ord = Seq(col("date"))
    val withInd = Indicators.withRsi(
      Indicators.withEmaClosedForm(
        Indicators.withChange(bars, "close", key, ord).drop("prev_value"),
        "close", n, key, ord),
      "close", n, key, ord)
    withInd.na.fill(0.0, Seq("change", "ema", "rsi"))
  }

  /** S6 fixed: partitioned, time-sorted lake write (never collect+loop).
    * `sortWithinPartitions` keeps files time-ordered inside each symbol
    * partition so serving top-k scans stay cheap (SURVEY §4 sort-order). */
  def writeLake(df: DataFrame, path: String): Unit =
    df.repartition(col("symbol"))
      .sortWithinPartitions("symbol", "date")
      .write.mode("overwrite")
      .partitionBy("symbol")
      .parquet(path)

  /** Full E1: read all symbol files → normalize → enrich → lake. */
  def backfill(spark: SparkSession, symbolPaths: Map[String, String],
               outPath: String, n: Int = 25): Unit = {
    val raw = symbolPaths.map { case (sym, p) => readRawBars(spark, p, sym) }
      .reduce(_ unionByName _)
    writeLake(enrich(normalizeBars(raw), n), outPath)
  }
}
