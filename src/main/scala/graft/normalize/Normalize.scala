package graft.normalize

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The normalize layer: every scalar parse/cast in the reference
  * (SURVEY.md §2.7 F1-F15), re-expressed as pure Catalyst `Column`
  * expressions — **no UDFs** — so whole-stage codegen stays intact and
  * Catalyst can constant-fold / push down around them. The reference used
  * per-row Python UDFs for F1/F2 (`pipeline/util/util.py:41-49,68-73`),
  * which break codegen and pay the Python serialization wall; these are
  * drop-in expression equivalents with the declared-type bug of
  * `toInt`-as-StringType (`util.py:69`) fixed.
  */
object Normalize {

  /** Characters the raw OLHC feed embeds in numerics: comma
    * thousands-separators, ASCII spaces, NBSP ( ), CR/LF.
    * (`data/data_olhc` JSON corpus; `data/crawl.py:36-44`.)
    */
  private val JunkRe = "[,\\s \r\n]"

  /** F1 `toFloat` (`util.py:41-44`): strip separators → float. try_cast,
    * not cast: under Spark 4 ANSI a residual non-numeric (feed
    * placeholder "-", empty string) must yield null, not kill the job. */
  def toFloatCol(c: Column): Column =
    regexp_replace(c, JunkRe, "").try_cast(FloatType)

  /** F1 at double precision for downstream indicator math. */
  def toDoubleCol(c: Column): Column =
    regexp_replace(c, JunkRe, "").try_cast(DoubleType)

  /** F2 `toInt` (`util.py:46-49`): strip separators → long (fixing the
    * reference's StringType-typed int UDF, `util.py:69`). */
  def toLongCol(c: Column): Column =
    regexp_replace(c, JunkRe, "").try_cast(LongType)

  /** F3 (`util.py:66`): `dd/MM/yyyy` string → date. */
  def parseDateDMY(c: Column): Column = to_date(trim(c), "dd/MM/yyyy")

  /** F4 `convertToDate` (`util.py:51-55`): `dd/MM/yyyy` → timestamp
    * shifted +7h — the reference bakes the Asia/Ho_Chi_Minh offset into
    * the stored instant; we reproduce it explicitly and keep the session
    * in UTC (SURVEY §7 timezone note). */
  def parseDateDMYPlus7h(c: Column): Column =
    to_timestamp(trim(c), "dd/MM/yyyy") + expr("INTERVAL 7 HOURS")

  /** F5 `convertDate` (`util.py:35-39`): `"HH:mm ... dd/MM/yyyy"` tick
    * time → epoch seconds. The feed embeds arbitrary text between the
    * time and the date; extract both fields then parse. */
  def parseTickTimeEpoch(c: Column): Column = {
    val hm = regexp_extract(c, "(\\d{1,2}:\\d{2})", 1)
    val dmy = regexp_extract(c, "(\\d{2}/\\d{2}/\\d{4})", 1)
    // 'H' (not 'HH'): the feed writes single-digit hours ("9:05"), which
    // 'HH' rejects; try_to_timestamp so a line with no parseable
    // date/time yields null instead of an ANSI DateTimeException
    unix_timestamp(try_to_timestamp(concat(dmy, lit(" "), hm),
      lit("dd/MM/yyyy H:mm")))
  }

  /** F6 `convertTime` (`util.py:24-25`): `dd/MM/yyyy` → epoch seconds. */
  def dateToEpoch(c: Column): Column =
    unix_timestamp(to_timestamp(trim(c), "dd/MM/yyyy"))

  /** F7 `convertChange` (`util.py:27-29`): `"x (y %)"` → y/100. */
  def convertChange(c: Column): Column =
    regexp_extract(c, "\\(\\s*(-?[0-9.]+)\\s*%\\s*\\)", 1).cast(DoubleType) / 100.0

  /** F8 `convertPrice` (`util.py:21-22`): strip NBSP. */
  def cleanPrice(c: Column): Column = regexp_replace(c, " ", "")

  /** F9 `convertSingle` (`util.py:31-33`): strip CR/LF/spaces. */
  def cleanSingle(c: Column): Column = regexp_replace(c, "[\\r\\n ]", "")

  /** F10 `string_to_float` (`util.py:10-14`). */
  def stringToDouble(c: Column): Column = c.cast(DoubleType)

  /** F11 `splitTextToTriplet` (`util.py:16-19`): n-word groups. */
  def splitToNgroups(c: Column, n: Int): Column = {
    val toks = split(c, "\\s+")
    val idx = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(n))
    transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** F12 `prev_weekday` (`util.py:122-125`): roll back to Mon-Fri.
    * Spark dayofweek: 1=Sunday … 7=Saturday. */
  def prevWeekday(c: Column): Column =
    when(dayofweek(c) === 1, date_sub(c, 2))        // Sun -> Fri
      .when(dayofweek(c) === 7, date_sub(c, 1))     // Sat -> Fri
      .otherwise(c)

  /** F13 `check_trading_hour` (`producer.py:43-50`): clamp a timestamp to
    * the 09:30-16:00 session; before-open rolls to the previous weekday's
    * 16:00, after-close clamps to 16:00 same day. */
  def clampTradingHour(ts: Column): Column = {
    val secs = hour(ts) * 3600 + minute(ts) * 60 + second(ts)
    val open = lit(9 * 3600 + 30 * 60)
    val close = lit(16 * 3600)
    val closeAt = (d: Column) => to_timestamp(concat(d.cast(StringType), lit(" 16:00:00")))
    when(secs < open, closeAt(prevWeekday(date_sub(ts.cast(DateType), 1))))
      .when(secs > close, closeAt(ts.cast(DateType)))
      .otherwise(ts)
  }

  /** F15 `ast.literal_eval` equivalent (`warehouse.py:169,190`): the
    * reference's producer ships Python-repr dict strings
    * (`producer.py:126`); rewrite the repr into JSON (quote style,
    * None/True/False) so `from_json` can take it. Sufficient for the
    * feed's numeric/symbol payloads; strings with embedded apostrophes
    * need the JSON producer path ([[graft.streaming.TickIngest.toKafkaFrame]],
    * the engine's standard). */
  def pythonReprToJson(c: Column): Column = {
    val quoted = regexp_replace(c, "'", "\"")
    // rewrite keywords only in VALUE position (unquoted, after ':' or in
    // a list) so string payloads like "status": "None" survive verbatim
    def kw(col0: Column, py: String, js: String): Column =
      regexp_replace(col0, s"([:\\[,]\\s*)$py(\\s*[,}\\]])", s"$$1$js$$2")
    kw(kw(kw(quoted, "None", "null"), "True", "true"), "False", "false")
  }

  /** Raw OLHC bar shape (`data/data_olhc` JSON files; FIXTURES.md A1). */
  val rawBarFields: Seq[String] =
    Seq("date", "open", "high", "low", "close", "volume", "value")

  /** Streaming tick schema — 11 fields (`warehouse.py:119-133`). */
  val tickSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("time", TimestampType),
    StructField("open", FloatType),
    StructField("high", FloatType),
    StructField("low", FloatType),
    StructField("close", FloatType),
    StructField("volume", StringType),
    StructField("previous_close", StringType),
    StructField("ref", StringType),
    StructField("ceil", StringType),
    StructField("floor", StringType)))

  /** News record shape (`producer.py:83-88`): epoch-millis-as-string time. */
  val newsSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("source", StringType),
    StructField("img", StringType),
    StructField("time", StringType)))
}
