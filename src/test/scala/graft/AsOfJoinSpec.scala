package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches latest right value at-or-before left time per key") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("A", ts("2024-01-01 10:10:00"), 99.0),
      ("B", ts("2024-01-01 10:07:00"), 50.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      ("A", ts("2024-01-01 10:03:00"), 1L),  // -> 100.0
      ("A", ts("2024-01-01 10:05:00"), 2L),  // exact tie -> 101.0 (inclusive)
      ("A", ts("2024-01-01 10:59:00"), 3L),  // -> 99.0
      ("B", ts("2024-01-01 10:06:00"), 4L),  // before any quote -> null
      ("B", ts("2024-01-01 10:08:00"), 5L)   // -> 50.0
    ).toDF("sym", "tt", "trade_id")
    val got = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(got(1L).contains(100.0))
    assert(got(2L).contains(101.0))
    assert(got(3L).contains(99.0))
    assert(got(4L).isEmpty)
    assert(got(5L).contains(50.0))
  }

  test("asofJoin: null value on the most recent right row stays null (ASOF semantics)") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), Some(100.0), Some(5.0)),
      ("A", ts("2024-01-01 10:02:00"), None, Some(7.0)) // latest: px null, sz 7
    ).toDF("sym", "qt", "px", "sz")
    val trades = Seq(("A", ts("2024-01-01 10:03:00"), 1L)).toDF("sym", "tt", "id")
    val r = graft.operators.AsOfJoin
      .asofJoin(trades, quotes, Seq("sym"), "tt", "qt", Seq("px", "sz")).head()
    // the 10:02 row is chosen atomically: px null (NOT 100.0 from 10:00), sz 7
    assert(r.isNullAt(3), s"expected null px from latest row, got ${r.get(3)}")
    assert(r.getDouble(4) == 7.0)
  }

  test("asofJoin handles a value column name shared with the left side") {
    val trades = Seq(("A", ts("2024-01-01 10:01:00"), 99.9))
      .toDF("sym", "tt", "px") // left carries its own px
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 100.0))
      .toDF("sym", "qt", "px")
    val out = graft.operators.AsOfJoin
      .asofJoin(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
    assert(out.columns.toSeq == Seq("sym", "tt", "px", "px_asof"))
    val r = out.head()
    assert(r.getDouble(2) == 99.9 && r.getDouble(3) == 100.0)
  }

  test("asofJoin preserves left row count and column order") {
    val l = Seq(("A", ts("2024-01-01 00:00:01"), "x")).toDF("k", "t", "payload")
    val r = Seq(("A", ts("2024-01-01 00:00:00"), 1.0, 2.0)).toDF("k", "rt", "v1", "v2")
    val out = AsOfJoin.asofJoin(l, r, Seq("k"), "t", "rt", Seq("v1", "v2"))
    assert(out.columns.toSeq == Seq("k", "t", "payload", "v1", "v2"))
    assert(out.count() == 1)
  }
}
