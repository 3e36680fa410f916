package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** E3 — the notebook's ad-hoc analytics surface (SURVEY.md §3 E3;
  * reference `Query.ipynb`): explicit-schema CSV ingestion and the three
  * query shapes (parameterized range query, describe, extremum), each
  * with a `spark.sql` twin so the same analytics run as SQL — the
  * reference exposed only the DataFrame forms.
  */
object Analytics {

  /** The notebook's explicit CSV schema (`Query.ipynb` cell 1): dates kept
    * as sortable yyyyMMdd strings, compared lexically/numerically. */
  val csvBarSchema: StructType = StructType(Seq(
    StructField("Ticker", StringType),
    StructField("DTYYYYMMDD", StringType),
    StructField("OpenFixed", DoubleType),
    StructField("HighFixed", DoubleType),
    StructField("LowFixed", DoubleType),
    StructField("CloseFixed", DoubleType),
    StructField("Volume", IntegerType)))

  /** S2: header CSV scan with the explicit schema (`Query.ipynb` cells 2-4). */
  def readCsvBars(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(csvBarSchema).option("header", "true").csv(path)

  /** `Query(start, end, kind, ticker)` (`Query.ipynb` cell 7): project the
    * date key + one metric, open-interval range on the sortable date. */
  def barsBetween(df: DataFrame, start: String, end: String,
                  kind: String, ticker: String): DataFrame =
    df.where(col("Ticker") === ticker)
      .select(col("DTYYYYMMDD"), col(kind))
      .where(col("DTYYYYMMDD") > lit(start) && col("DTYYYYMMDD") < lit(end))

  /** SQL twin of [[barsBetween]] via a temp view. Values bind through
    * named parameter markers (never string interpolation — a
    * quote-bearing ticker must filter, not parse or inject); the metric
    * column name, which cannot be a parameter, is validated against the
    * frame's schema. */
  def barsBetweenSql(spark: SparkSession, df: DataFrame, start: String,
                     end: String, kind: String, ticker: String): DataFrame = {
    require(df.columns.contains(kind), s"unknown metric column '$kind'")
    df.createOrReplaceTempView("bars")
    spark.sql(
      s"""SELECT DTYYYYMMDD, `$kind` FROM bars
         |WHERE Ticker = :ticker AND DTYYYYMMDD > :start AND DTYYYYMMDD < :end
         |""".stripMargin,
      Map("ticker" -> ticker, "start" -> start, "end" -> end))
  }

  /** describe() (`Query.ipynb` cells 5-6, 16-20). */
  def summary(df: DataFrame, cols: String*): DataFrame = df.describe(cols: _*)

  /** min/max extremum (`Query.ipynb` cells 21-22). */
  def extremum(df: DataFrame, c: String, isMax: Boolean): DataFrame =
    if (isMax) df.agg(max(col(c)).as(s"max_$c"))
    else df.agg(min(col(c)).as(s"min_$c"))

  /** Registry demonstration that the SQL entry point produces identical
    * results: TPC-H Q1 phrased through `spark.sql` over temp views. */
  def sqlQ1(s: SparkSession, d: String): DataFrame = {
    graft.Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_q1" -> (sqlQ1 _))

  val oracle: Map[String, String] = Map(
    "q_sql_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  avg(l_extendedprice) AS avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)
}
