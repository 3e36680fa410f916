package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ewma, Indicators}

/** W1-W5/A5 indicator semantics: closed-form EMA vs exact sequential fold,
  * RSI bounds, change/lag correctness on a hand-computed series.
  */
class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private val key = Seq("sym")
  private def ord = Seq(col("t"))

  private def series(xs: Double*) =
    xs.zipWithIndex.map { case (x, i) => ("A", i.toLong, x) }.toDF("sym", "t", "close")

  test("withChange = x_t - x_{t-1} per key (W1)") {
    val df = Indicators.withChange(series(10, 12, 11, 15), "close", key, ord)
    val got = df.orderBy("t").select("change").collect().map(r => Option(r.get(0)))
    assert(got(0).isEmpty)
    assert(got.drop(1).flatten.map(_.asInstanceOf[Double]).sameElements(Array(2.0, -1.0, 4.0)))
  }

  test("pct_change matches pandas semantics (W5)") {
    val df = Indicators.withPctChange(series(100, 110, 99), "close", key, ord)
    val got = df.orderBy("t").select("pct_change").collect()
    assert(got(0).isNullAt(0))
    assert(math.abs(got(1).getDouble(0) - 0.10) < 1e-12)
    assert(math.abs(got(2).getDouble(0) - (-0.10)) < 1e-12)
  }

  test("trailing/forward row-frame means (W2/W3)") {
    val df = Indicators.forwardAvg(
      Indicators.trailingAvg(series(1, 2, 3, 4), "close", 1, key, ord),
      "close", 2, key, ord)
    val rows = df.orderBy("t").select("trailing_avg", "forward_avg").collect()
    // trailing over 2 rows: 1, 1.5, 2.5, 3.5 ; forward over 2 rows: 1.5, 2.5, 3.5, 4
    assert(rows.map(_.getDouble(0)).sameElements(Array(1.0, 1.5, 2.5, 3.5)))
    assert(rows.map(_.getDouble(1)).sameElements(Array(1.5, 2.5, 3.5, 4.0)))
  }

  test("closed-form EMA equals the recursive definition (A5/W4)") {
    val xs = Seq(50.0, 52.0, 51.0, 53.0, 57.0, 56.0, 58.0, 60.0, 59.0, 61.0)
    val n = 3
    val alpha = 2.0 / (n + 1)
    val expected = xs.tail.scanLeft(xs.head)((e, x) => alpha * x + (1 - alpha) * e)
    val df = Indicators.withEmaClosedForm(series(xs: _*), "close", n, key, ord)
    val got = df.orderBy("t").select("ema").collect().map(_.getDouble(0))
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9, s"$g vs $e") }
  }

  test("reference-compat EMA equals the literal seed+refinement loop") {
    // replicate util.py:76-82 LITERALLY: seed = forward mean of the next
    // n values (clipped at the series end), then n-1 applications of
    // e = α·x + (1-α)·e against the SAME row's x — the quirk the compat
    // variant's closed form (value·(1-w) + fwd_mean·w) must reproduce
    val xs = (1 to 60).map(i => 100.0 + 7 * math.sin(i))
    val n = 25
    val alpha = 2.0 / (n + 1)
    val expect = xs.indices.map { i =>
      val fwd = xs.slice(i, math.min(i + n, xs.length))
      var e = fwd.sum / fwd.size
      for (_ <- 1 until n) e = alpha * xs(i) + (1 - alpha) * e
      e
    }
    val got = Indicators.withEmaReferenceCompat(
        series(xs: _*), "close", n, key, ord)
      .orderBy("t").select("ema_ref").collect().map(_.getDouble(0))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"$g vs $e") }
    // and it deliberately DISAGREES with the standard recursive EMA —
    // the deviation the SURVEY documents, now checkable
    val std = Indicators.withEmaClosedForm(series(xs: _*), "close", n, key, ord)
      .orderBy("t").select("ema").collect().map(_.getDouble(0))
    assert(got.zip(std).exists { case (a, b) => math.abs(a - b) > 1e-6 })
  }

  test("Ewma.perRow exact fold matches closed form on events fixture") {
    val ev = Tables.events(spark, sf0001).select("user_id", "event_id", "value")
    val closed = Indicators.withEmaClosedForm(ev, "value", 25,
      Seq("user_id"), Seq(col("event_id")))
    val exact = Ewma.perRow(ev, "value", 25, Seq("user_id"), Seq("event_id"))
    val joined = closed.join(exact.withColumnRenamed("value", "v2"),
      Seq("user_id", "event_id"))
    val maxDiff = joined.agg(max(abs(col("ema") - col("ema_exact")))).head().getDouble(0)
    assert(maxDiff < 1e-6, s"max closed-vs-exact diff $maxDiff")
  }

  test("Ewma.perRow: null observation emits prior state without resetting") {
    val df = Seq(("A", 1L, java.lang.Double.valueOf(10.0)),
                 ("A", 2L, null.asInstanceOf[java.lang.Double]),
                 ("A", 3L, java.lang.Double.valueOf(20.0)))
      .toDF("sym", "t", "close")
    val out = Ewma.perRow(df, "close", 3, Seq("sym"), Seq("t"))
      .orderBy("t").select("ema_exact").collect()
    assert(out(0).getDouble(0) == 10.0)
    assert(out(1).getDouble(0) == 10.0)          // null -> carry state
    // state continued from 10: 0.5*20 + 0.5*10 = 15 (NOT a reseed to 20)
    assert(math.abs(out(2).getDouble(0) - 15.0) < 1e-12)
  }

  test("EwmaAgg aggregator is order-insensitive across partials") {
    import graft.operators.Ewma.EwmaAgg
    val agg = new EwmaAgg(0.5).toColumn.name("ema_final")
    val ds = Seq(("A", 3L, 30.0), ("A", 1L, 10.0), ("A", 2L, 20.0),
                 ("B", 1L, 5.0)).toDF("sym", "t", "x")
      .repartition(4)
      .as[(String, Long, Double)]
    val got = ds.groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg)
      .collect().toMap
    // A: fold 10 -> .5*20+.5*10=15 -> .5*30+.5*15=22.5
    assert(math.abs(got("A") - 22.5) < 1e-12)
    assert(math.abs(got("B") - 5.0) < 1e-12)
  }

  test("EwmaAgg long-series key matches the sequential fold exactly") {
    import graft.operators.Ewma.EwmaAgg
    val n = 50000
    val xs = (1 to n).map(i => 100.0 + 10 * math.sin(i * 0.01))
    val agg = new EwmaAgg(0.1).toColumn.name("ema_final")
    val got = xs.zipWithIndex.map { case (x, i) => ("K", i.toLong, x) }
      .toDF("sym", "t", "x").repartition(8)
      .as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg)
      .collect().toMap
    val expect = Ewma.fold(0.1)(xs.iterator).foldLeft(Double.NaN)((_, v) => v)
    assert(math.abs(got("K") - expect) < 1e-9)
  }

  test("emaSegmented: segmented scan matches EwmaAgg and the fold") {
    import graft.operators.Ewma.EwmaAgg
    // multi-key, irregular ords (gaps, non-zero start), values from a
    // deterministic hash — the property: two-level affine composition
    // equals the sequential fold to re-association ulps
    val rows = for {
      (sym, seed) <- Seq(("A", 1), ("B", 7), ("C", 13))
      i <- 0 until 997
    } yield (sym, seed * 3 + i * 5L, // unique, non-contiguous ords
      80.0 + ((i * seed * 2654435761L) % 1000L).toDouble / 25.0)
    val df = rows.toDF("sym", "t", "x").repartition(8)
    val expect = rows.groupBy(_._1).map { case (sym, rs) =>
      sym -> Ewma.fold(0.2)(rs.sortBy(_._2).iterator.map(_._3))
        .foldLeft(Double.NaN)((_, v) => v)
    }
    // chunkWidth small enough that every key spans many chunks, and a
    // single-chunk width as the degenerate case
    for (w <- Seq(64L, 1L << 40)) {
      val got = Ewma.emaSegmented(df, "x", 9, Seq("sym"), "t", chunkWidth = w)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      expect.foreach { case (sym, e) =>
        assert(math.abs(got(sym) - e) / math.abs(e) < 1e-10,
          s"sym=$sym w=$w got=${got(sym)} expect=$e")
      }
    }
    // and against EwmaAgg itself on the same frame (alpha = 2/(9+1))
    val agg = new EwmaAgg(0.2).toColumn.name("ema_final")
    val viaAgg = df.as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg).collect().toMap
    val seg = Ewma.emaSegmented(df, "x", 9, Seq("sym"), "t", chunkWidth = 128)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    viaAgg.foreach { case (sym, e) =>
      assert(math.abs(seg(sym) - e) / math.abs(e) < 1e-10) }
    // null values are identity maps: final EMA unchanged by null rows
    val withNulls = df.unionByName(
      Seq(("A", 9999L, null.asInstanceOf[java.lang.Double]))
        .toDF("sym", "t", "x"))
    val gotN = Ewma.emaSegmented(withNulls, "x", 9, Seq("sym"), "t",
      chunkWidth = 64).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(gotN("A") - expect("A")) / math.abs(expect("A")) < 1e-10)
  }

  test("EwmaAgg throws past its per-key buffer bound instead of OOMing") {
    import graft.operators.Ewma.EwmaAgg
    val agg = new EwmaAgg(0.1, maxRowsPerKey = 1000).toColumn.name("ema_final")
    val ds = (1 to 1500).map(i => ("K", i.toLong, i.toDouble))
      .toDF("sym", "t", "x").repartition(4)
      .as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg)
    val ex = intercept[Exception] { ds.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("unspillable")),
      s"expected the EwmaAgg bound message, got: ${messages(ex)}")
    // under the bound, same pipeline is fine
    val ok = new EwmaAgg(0.1, maxRowsPerKey = 2000).toColumn.name("ema_final")
    val got = (1 to 1500).map(i => ("K", i.toLong, i.toDouble))
      .toDF("sym", "t", "x").repartition(4)
      .as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(ok)
      .collect().toMap
    assert(got.contains("K"))
  }

  test("closed-form EMA raises past its documented overflow bound") {
    val n = 2 // alpha = 2/3, bound ≈ 632 rows
    val bound = Indicators.emaClosedFormRowBound(n)
    assert(bound > 100 && bound < 1000)
    val long = (1 to (bound.toInt + 10)).map(i => ("A", i.toLong, 100.0))
      .toDF("sym", "t", "close")
    val ok = Indicators.withEmaClosedForm(long.limit(bound.toInt), "close", n, key, ord)
    assert(ok.where(col("ema").isNull || isnan(col("ema"))).count() == 0)
    val ex = intercept[Exception] {
      Indicators.withEmaClosedForm(long, "close", n, key, ord).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("Ewma.perRow")))
  }

  test("closed-form EMA raises on value-magnitude overflow below the row bound") {
    // 1e160-scale values overflow the value·r^-rn cumulative sum at
    // ~310 rows with n=2 — well under the ~632-row rn bound, so only the
    // finiteness guard can catch it
    val big = (1 to 400).map(i => ("A", i.toLong, 1.0e160)).toDF("sym", "t", "close")
    val ex = intercept[Exception] {
      graft.operators.Indicators.withEmaClosedForm(big, "close", 2, key, ord).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("Ewma.perRow")))
    // a non-finite INPUT propagates instead of raising
    val withInf = Seq(("A", 1L, 1.0), ("A", 2L, Double.PositiveInfinity),
      ("A", 3L, 2.0)).toDF("sym", "t", "close")
    val out = graft.operators.Indicators
      .withEmaClosedForm(withInf, "close", 2, key, ord)
      .orderBy("t").select("ema").collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(!java.lang.Double.isFinite(out(2).getDouble(0)))
    // a NULL input mid-series must NOT disarm the magnitude guard
    // (sum() skips nulls, so the overflow is still value-caused and must
    // still raise). The null sits at t=200, before the overflow point.
    val withNull = (1 to 400).map(i =>
      ("A", i.toLong, if (i == 200) Option.empty[Double] else Some(1.0e160)))
      .toDF("sym", "t", "close")
    val ex2 = intercept[Exception] {
      graft.operators.Indicators.withEmaClosedForm(withNull, "close", 2, key, ord).collect()
    }
    assert(msgs(ex2).exists(m => m != null && m.contains("Ewma.perRow")))
  }

  test("Bollinger bands bracket the mid; flat series collapses the band") {
    val df = Indicators.withBollinger(series(1, 2, 3, 4, 5, 6), "close", 3, 2.0, key, ord)
    val bad = df.where(col("bb_upper") < col("bb_mid") || col("bb_lower") > col("bb_mid"))
    assert(bad.count() == 0)
    val flat = Indicators.withBollinger(series(5, 5, 5, 5), "close", 3, 2.0, key, ord)
      .orderBy(desc("t")).select("bb_upper", "bb_lower").head()
    assert(flat.getDouble(0) == 5.0 && flat.getDouble(1) == 5.0)
  }

  test("MACD matches directly-computed EMA difference and signal recurrence") {
    val xs = (1 to 50).map(i => 100.0 + 10 * math.sin(i / 5.0))
    val df = Indicators.withMacd(series(xs: _*), "close", key, ord)
      .orderBy("t").select("macd", "macd_signal", "macd_hist").collect()
    def emaSeq(n: Int, in: Seq[Double]) = {
      val a = 2.0 / (n + 1)
      in.tail.scanLeft(in.head)((e, x) => a * x + (1 - a) * e)
    }
    val expectMacd = emaSeq(12, xs).zip(emaSeq(26, xs)).map { case (f, s) => f - s }
    val expectSig = emaSeq(9, expectMacd)
    df.zip(expectMacd.zip(expectSig)).foreach { case (row, (m, sg)) =>
      assert(math.abs(row.getDouble(0) - m) < 1e-8)
      assert(math.abs(row.getDouble(1) - sg) < 1e-8)
      assert(math.abs(row.getDouble(2) - (m - sg)) < 1e-8)
    }
  }

  test("RSI bounded in [0,100] and null-prefixed (property over fixture)") {
    val ev = Tables.events(spark, sf0001).select("user_id", "event_id", "value")
    val rsi = Indicators.withRsi(ev, "value", 14, Seq("user_id"), Seq(col("event_id")))
    val bad = rsi.where(col("rsi") < 0 || col("rsi") > 100).count()
    assert(bad == 0)
    // monotone-up series has RSI 100, monotone-down 0
    val up = Indicators.withRsi(series(1, 2, 3, 4, 5), "close", 3, key, ord)
      .orderBy(desc("t")).select("rsi").head().getDouble(0)
    val down = Indicators.withRsi(series(5, 4, 3, 2, 1), "close", 3, key, ord)
      .orderBy(desc("t")).select("rsi").head().getDouble(0)
    assert(up == 100.0 && down == 0.0)
  }
}
