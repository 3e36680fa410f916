package graft

import org.apache.spark.sql.functions._
import graft.normalize.Normalize
import graft.ingest.BarsIngest

/** F1-F13 normalize expressions against the exact corruption patterns of
  * the reference corpus (FIXTURES.md A1: `"750,800 "`, `"80.70 "`, NBSP,
  * dd/MM/yyyy) plus the real `data/data_olhc/FPT.json` fixture end-to-end.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("toFloat/toLong strip commas, spaces, NBSP (F1/F2)") {
    val df = Seq(("750,800 ", "60,902,000,000 ", "80.70 "))
      .toDF("vol", "value", "close")
      .select(
        Normalize.toLongCol($"vol").as("vol"),
        Normalize.toLongCol($"value").as("value"),
        Normalize.toFloatCol($"close").as("close"))
    val r = df.head()
    assert(r.getLong(0) == 750800L)
    assert(r.getLong(1) == 60902000000L)
    assert(math.abs(r.getFloat(2) - 80.70f) < 1e-5)
  }

  test("dd/MM/yyyy parse, +7h shift, epoch (F3/F4/F6)") {
    val df = Seq("07/02/2023").toDF("d").select(
      Normalize.parseDateDMY($"d").as("date"),
      Normalize.parseDateDMYPlus7h($"d").as("ts7"),
      Normalize.dateToEpoch($"d").as("epoch"))
    val r = df.head()
    assert(r.getDate(0).toString == "2023-02-07")
    assert(r.getTimestamp(1).toInstant.toString == "2023-02-07T07:00:00Z")
    assert(r.getLong(2) == 1675728000L)
  }

  test("tick time string to epoch, incl. single-digit hours (F5)") {
    val df = Seq("14:45 | Cập nhật 07/02/2023", "9:05 | Cập nhật 07/02/2023")
      .toDF("t").select(Normalize.parseTickTimeEpoch($"t").as("e"))
    val got = df.collect().map(_.getLong(0))
    assert(got(0) == 1675781100L) // 2023-02-07T14:45:00Z
    assert(got(1) == 1675760700L) // 2023-02-07T09:05:00Z
  }

  test("casts are total under ANSI: junk placeholders yield null, not errors") {
    val df = Seq("750,800 ", "-", "", "N/A").toDF("s").select(
      Normalize.toLongCol($"s").as("l"),
      Normalize.toFloatCol($"s").as("f"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 750800L)
    assert(rows.drop(1).forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("change percent extraction (F7)") {
    val df = Seq("0.5 (2.35 %)", "-1.2 (-3.10 %)").toDF("c")
      .select(Normalize.convertChange($"c").as("f"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0235) < 1e-9)
    assert(math.abs(got(1) - (-0.031)) < 1e-9)
  }

  test("string cleaners (F8/F9)") {
    val df = Seq(("12 345", "a b\r\nc")).toDF("p", "s").select(
      Normalize.cleanPrice($"p").as("p"),
      Normalize.cleanSingle($"s").as("s"))
    val r = df.head()
    assert(r.getString(0) == "12345")
    assert(r.getString(1) == "abc")
  }

  test("prev_weekday rolls weekend back to Friday (F12)") {
    // 2023-02-05 is a Sunday, 2023-02-04 a Saturday, 2023-02-06 a Monday
    val df = Seq("2023-02-05", "2023-02-04", "2023-02-06").toDF("d")
      .select(Normalize.prevWeekday(to_date($"d")).as("w"))
    val got = df.collect().map(_.getDate(0).toString)
    assert(got.sameElements(Array("2023-02-03", "2023-02-03", "2023-02-06")))
  }

  test("splitToNgroups groups words in triplets (F11)") {
    val df = Seq("a b c d e f g").toDF("t")
      .select(Normalize.splitToNgroups($"t", 3).as("g"))
    val got = df.head().getSeq[String](0)
    assert(got == Seq("a b c", "d e f", "g"))
  }

  test("python-repr message decode (F15): repr dict -> from_json") {
    val repr = "{'symbol': 'FPT', 'close': 80.7, 'volume': '750,800', " +
      "'ref': None, 'status': 'None'}"
    val df = Seq(repr).toDF("value")
      .select(from_json(Normalize.pythonReprToJson($"value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "symbol STRING, close DOUBLE, volume STRING, ref STRING, status STRING")).as("m"))
      .select($"m.*")
    val r = df.head()
    assert(r.getString(0) == "FPT")
    assert(r.getDouble(1) == 80.7)
    assert(r.getString(2) == "750,800")
    assert(r.isNullAt(3))                      // bare None -> JSON null
    assert(r.getString(4) == "None")           // quoted 'None' preserved
  }

  test("tick time parse is null-total on malformed lines (F5 under ANSI)") {
    val df = Seq("Cập nhật", "14:45 | no date here").toDF("t")
      .select(Normalize.parseTickTimeEpoch($"t").as("e"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("E1 end-to-end on reference FPT.json: normalize + indicators") {
    val fpt = "/root/reference/data/data_olhc/FPT.json"
    assume(new java.io.File(fpt).exists())
    val bars = BarsIngest.normalizeBars(BarsIngest.readRawBars(spark, fpt, "FPT"))
    assert(bars.schema("date").dataType.typeName == "date")
    assert(bars.count() == 2382)
    val enriched = BarsIngest.enrich(bars).cache()
    // RSI bounded, EMA within price range, change telescopes
    val stats = enriched.agg(
      min("rsi"), max("rsi"),
      min("ema"), max("ema"),
      min("close"), max("close"),
      sum("change"), first("close"), last("close")).head()
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 100.0)
    assert(stats.getDouble(2) >= 0.0 && stats.getDouble(3) <= stats.getFloat(5) * 1.01)
    enriched.unpersist()
  }
}
