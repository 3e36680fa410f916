package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.GroupState

/** T3 — stateful streaming indicator maintenance (SURVEY.md §2.8 T3;
  * reference `pipeline/warehouse.py:167-186`): for each arriving daily
  * bar, recompute change / RSI / EMA against that symbol's recent history
  * and emit the refreshed row.
  *
  * The reference re-reads the last 20 stored rows from Cassandra per
  * message and recomputes with pandas; here the history IS the keyed
  * stream state (ring buffer of the last `window+1` closes + the running
  * EMA), so a refresh touches no external store and scales horizontally
  * with executor count — state lives in the state store, keyed by symbol.
  *
  * Semantics: change = close - prev_close; RSI = Cutler SMA-gain/loss over
  * the trailing `window`-diff frame (same as the batch
  * [[graft.operators.Indicators.withRsi]]); EMA = exact recursive fold
  * (same as [[graft.operators.Ewma]]) — so streaming and batch agree,
  * which the reference's two code paths did not (SURVEY §2.5 note).
  */
object IndicatorState {

  case class BarIn(symbol: String, time: Timestamp, close: Double)
  case class BarState(closes: List[Double], ema: Double)

  /** `change`/`rsi` are Options so the streaming path emits NULL exactly
    * where the batch twins do (no previous close / no diff history /
    * flat series) — not a sentinel 0.0 a consumer could mistake for a
    * real value. */
  case class IndicatorOut(symbol: String, time: Timestamp, close: Double,
                          change: Option[Double], rsi: Option[Double], ema: Double)

  val defaultWindow = 25
  def alpha(n: Int): Double = 2.0 / (n + 1.0)

  /** Pure per-key transition: previous state + new bar → (output, state).
    * Exposed for direct unit testing and reused by the streaming wiring. */
  def step(state: Option[BarState], bar: BarIn, n: Int): (IndicatorOut, BarState) = {
    val a = alpha(n)
    val prevCloses = state.map(_.closes).getOrElse(Nil)
    val ema = state match {
      case None => bar.close
      case Some(s) => a * bar.close + (1 - a) * s.ema
    }
    val closes = (bar.close :: prevCloses).take(n + 2)
    // null (not 0.0) on the seed row — batch withChange emits lag null
    val change = prevCloses.headOption.map(bar.close - _)
    val diffs = closes.zip(closes.tail).map { case (cur, prev) => cur - prev }.take(n + 1)
    // null when there is no diff history or the series is flat — the
    // same cases where batch withRsi's avgGain+avgLoss>0 guard emits null
    val rsi =
      if (diffs.isEmpty) None
      else {
        val gains = diffs.map(d => math.max(d, 0.0))
        val losses = diffs.map(d => math.max(-d, 0.0))
        val g = gains.sum / gains.size
        val l = losses.sum / losses.size
        if (g + l == 0.0) None else Some(100.0 * (g / (g + l)))
      }
    (IndicatorOut(bar.symbol, bar.time, bar.close, change, rsi, ema),
      BarState(closes, ema))
  }

  /** flatMapGroupsWithState update function: bars of one symbol within a
    * micro-batch are applied in event-time order (the reference applied
    * arrival order; sorting inside the batch makes replays deterministic). */
  def updateFn(n: Int)(key: String, bars: Iterator[BarIn],
                       state: GroupState[BarState]): Iterator[IndicatorOut] = {
    var cur = state.getOption
    val out = bars.toSeq.sortBy(_.time.getTime).map { bar =>
      val (o, s) = step(cur, bar, n)
      cur = Some(s)
      o
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Wire a (possibly streaming) Dataset[BarIn] into the stateful
    * refresh. Works identically on batch Datasets (tests, backfill replay). */
  def attach(bars: Dataset[BarIn], n: Int = defaultWindow): Dataset[IndicatorOut] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val outEnc = Encoders.product[IndicatorOut]
    implicit val stEnc = Encoders.product[BarState]
    bars.groupByKey(_.symbol)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(updateFn(n))
  }

  /** Spark 4 `transformWithState` form of the same refresh — the
    * arbitrary-state API that supersedes flatMapGroupsWithState
    * (typed ValueState in the RocksDB state store, timer support,
    * state TTL). Same [[step]] transition, so both forms agree.
    * Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` on the session.
    */
  class IndicatorProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, BarIn, IndicatorOut] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[BarState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BarState](
        "indicator", Encoders.product[BarState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BarIn],
                                 timers: TimerValues): Iterator[IndicatorOut] = {
      var cur = Option(state.get())
      val out = rows.toSeq.sortBy(_.time.getTime).map { bar =>
        val (o, s) = step(cur, bar, n)
        cur = Some(s)
        o
      }
      cur.foreach(state.update)
      out.iterator
    }
  }

  /** [[attach]] via transformWithState (streaming Datasets only). */
  def attachTws(bars: Dataset[BarIn], n: Int = defaultWindow): Dataset[IndicatorOut] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    implicit val outEnc = Encoders.product[IndicatorOut]
    bars.groupByKey(_.symbol)(Encoders.STRING)
      .transformWithState(new IndicatorProcessor(n), TimeMode.None(), OutputMode.Append())
  }
}
