package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Indicators

/** SURVEY.md §2.5 window operators, phrased over the `events` fixture as a
  * bars view: key = user_id (symbol analog), order = (ts, event_id) —
  * event_id breaks timestamp ties deterministically — value = close analog.
  *
  * Every query is a single `Window.partitionBy(user_id)` pipeline: one hash
  * shuffle on the key, then sorted per-partition evaluation; this is the
  * plan shape that survives a 1000-executor scale-up (per-key series stay
  * together; no cross-key state).
  */
object WindowQueries {

  private val KEY = Seq("user_id")
  private def ORD = Seq(col("ts"), col("event_id"))

  /** W1: lag + absolute change (`to_db.py:45`). */
  def windowLag(s: SparkSession, d: String): DataFrame =
    Indicators.withChange(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", KEY, ORD)

  /** W3: trailing 26-row mean (`util.py:93-94`). */
  def windowTrailing(s: SparkSession, d: String): DataFrame =
    Indicators.trailingAvg(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", 25, KEY, ORD)

  /** W2: forward 25-row mean (`util.py:77-79`). */
  def windowForward(s: SparkSession, d: String): DataFrame =
    Indicators.forwardAvg(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", 25, KEY, ORD)

  /** W5: pct_change (`warehouse.py:181`). */
  def pctChange(s: SparkSession, d: String): DataFrame =
    Indicators.withPctChange(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", KEY, ORD)

  /** Cutler RSI n=25 (`util.py:84-105`). */
  def rsi(s: SparkSession, d: String): DataFrame =
    Indicators.withRsi(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", 25, KEY, ORD)

  /** Recursive EMA n=25, closed form (`util.py:76-82` intent; SURVEY §2.5
    * note — standard recurrence, seed = first value). */
  def ema(s: SparkSession, d: String): DataFrame =
    Indicators.withEmaClosedForm(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", 25, KEY, ORD)

  /** Final EMA per key via [[graft.operators.Ewma.emaSegmented]] — the
    * bounded-memory two-level segmented scan (r7 VERDICT item 2 asked for
    * an oracle row). `(user_id, ts)` is unique in the events fixture at
    * every SF (checked), so `unix_micros(ts)` is the integral per-key
    * ordering the operator requires and agrees with the (ts, event_id)
    * order every other window query uses. chunkWidth = 1 day of µs →
    * ~30 chunks over the one-month fixture span; the plan is two ordinary
    * hash aggregations (no one-partition window, no full-series buffer).
    */
  def emaSeg(s: SparkSession, d: String): DataFrame =
    graft.operators.Ewma.emaSegmented(
      events(s, d).select(col("user_id"), unix_micros(col("ts")).as("ord_us"),
        col("value")),
      "value", 25, Seq("user_id"), "ord_us",
      chunkWidth = 86400L * 1000000L, as = "ema")

  /** Reference-compat EMA variant (`util.py:76-82` literal semantics —
    * forward-mean seed + same-row refinements, collapsed to its closed
    * form): the engine's documented deviation from the reference batch
    * path, made oracle-checkable. */
  def emaRef(s: SparkSession, d: String): DataFrame =
    Indicators.withEmaReferenceCompat(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", 25, KEY, ORD)

  /** T3's deterministic BATCH TWIN as a registry query (r5 VERDICT item
    * 7): the streaming indicator state machine
    * ([[graft.streaming.IndicatorState.step]]) replayed relationally —
    * change (lag), Cutler RSI n=25, and the recursive EMA n=25 in ONE
    * key-partitioned window pipeline, so the reference's core stateful
    * capability gets a DuckDB oracle row in addition to its
    * streaming-vs-batch parity spec ([[graft.StreamingSpec]] pins that
    * a step-fold over sorted bars reproduces exactly these columns). */
  def indicatorReplay(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d).select("user_id", "ts", "event_id", "value")
    val withC = Indicators.withChange(base, "value", KEY, ORD).drop("prev_value")
    val withR = Indicators.withRsi(withC, "value", 25, KEY, ORD)
    Indicators.withEmaClosedForm(withR, "value", 25, KEY, ORD)
  }

  /** As-of join (SURVEY §2.3 engine extension): each click gets the most
    * recent purchase value at-or-before its timestamp, per user — the
    * tick-to-bar alignment operator, via [[graft.operators.AsOfJoin]]'s
    * single-shuffle union-scan. Oracle: DuckDB native ASOF LEFT JOIN. */
  def asof(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value"))
    graft.operators.AsOfJoin.asofJoin(
      clicks, purchases, Seq("user_id"), "ts", "pts", Seq("value"))
  }

  /** Sessionization (engine extension in the §2.5 window family): per-user
    * activity sessions with a 4-hour inactivity gap, via Spark's native
    * `session_window` aggregation — one hash shuffle on the key, then
    * per-partition sorted session merge. Session end = last event + gap,
    * and touching windows merge (diff == gap → same session); the oracle
    * twin is the gaps-and-islands form (`lag` + running sum of
    * new-session flags) with the matching `<=` boundary. */
  def sessionize(s: SparkSession, d: String): DataFrame =
    graft.operators.Sessionize.sessionAgg(
      events(s, d).select("user_id", "ts", "value"),
      "ts", "4 hours", Seq("user_id"),
      Seq(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value")))

  /** Keyless interval join (engine extension, SURVEY §2.3 join family):
    * every error event landing inside the 2-hour window opened by any
    * signup event — a pure range predicate with NO equi-key, the shape
    * Spark would otherwise plan as BroadcastNestedLoopJoin. Routed through
    * [[graft.operators.RangeJoin]]'s bucketed formulation (1-hour buckets
    * over epoch µs) so the physical plan is a plain shuffled equi-join on
    * the bucket id. Oracle: the naive inequality join, which DuckDB's
    * IEJoin handles fine at test scale. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val hourUs = 3600L * 1000000L
    val signups = ev.where(col("event_type") === "signup").select(
      col("event_id").as("signup_id"), col("ts").as("signup_ts"),
      unix_micros(col("ts")).as("lo"),
      (unix_micros(col("ts")) + 2 * hourUs).as("hi"))
    val errors = ev.where(col("event_type") === "error").select(
      col("event_id").as("error_id"), col("ts").as("error_ts"),
      unix_micros(col("ts")).as("p"))
    graft.operators.RangeJoin
      .bucketedRangeJoin(errors, "p", signups, "lo", "hi", hourUs)
      .select("signup_id", "error_id", "signup_ts", "error_ts")
  }

  /** Time-RANGE frame (vs row frames): trailing 2-day mean per key —
    * event-time window semantics where row counts vary per day. */
  def windowRange(s: SparkSession, d: String): DataFrame =
    events(s, d).select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("avg_2d", expr(
        """avg(value) OVER (PARTITION BY user_id ORDER BY ts
          |  RANGE BETWEEN INTERVAL 2 DAYS PRECEDING AND CURRENT ROW)""".stripMargin))

  /** first/last value + rank family over key-partitioned windows. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val byValue = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").asc, col("event_id").asc)
    val full = byTime.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    events(s, d).select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("first_v", first(col("value")).over(byTime))
      .withColumn("last_v", last(col("value")).over(full))
      .withColumn("quartile", ntile(4).over(byValue))
      .withColumn("pr", percent_rank().over(byValue))
      .withColumn("rnk", rank().over(byValue))
  }

  /** VWAP shape: quantity-weighted mean price per group. */
  def vwap(s: SparkSession, d: String): DataFrame =
    graft.Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg((sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")))
        .as("vwap"))

  /** Bollinger bands n=19 frame (20 rows), k=2. */
  def bollinger(s: SparkSession, d: String): DataFrame =
    Indicators.withBollinger(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", 19, 2.0, KEY, ORD)

  /** MACD(12,26,9) via composed closed-form EMAs. */
  def macd(s: SparkSession, d: String): DataFrame =
    Indicators.withMacd(
      events(s, d).select("user_id", "ts", "event_id", "value"),
      "value", KEY, ORD)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vwap"            -> (vwap _),
    "q_bollinger"       -> (bollinger _),
    "q_macd"            -> (macd _),
    "q_window_range"    -> (windowRange _),
    "q_window_rank"     -> (windowRank _),
    "q_asof"            -> (asof _),
    "q_session"         -> (sessionize _),
    "q_range_join"      -> (rangeJoin _),
    "q_window_lag"      -> (windowLag _),
    "q_window_trailing" -> (windowTrailing _),
    "q_window_forward"  -> (windowForward _),
    "q_pct_change"      -> (pctChange _),
    "q_rsi"             -> (rsi _),
    "q_ema"             -> (ema _),
    "q_ema_seg"         -> (emaSeg _),
    "q_ema_ref"         -> (emaRef _),
    "q_indicator_replay" -> (indicatorReplay _))

  private val OVER = "OVER (PARTITION BY user_id ORDER BY ts, event_id"

  val oracle: Map[String, String] = Map(
    "q_vwap" ->
      """SELECT l_returnflag,
        |  sum(l_extendedprice * l_quantity) / sum(l_quantity) AS vwap
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_bollinger" ->
      s"""SELECT user_id, ts, event_id, value,
         |  avg(value) $OVER ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS bb_mid,
         |  avg(value) $OVER ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |    + 2.0 * stddev_samp(value) $OVER ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS bb_upper,
         |  avg(value) $OVER ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
         |    - 2.0 * stddev_samp(value) $OVER ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS bb_lower
         |FROM events""".stripMargin,
    "q_macd" ->
      s"""WITH rn AS (
         |  SELECT user_id, ts, event_id, value, row_number() $OVER) AS r
         |  FROM events
         |), acc AS (
         |  SELECT user_id, ts, event_id, value, r,
         |    sum(value * pow(1.0 - 2.0/13.0, -r)) $OVER ROWS UNBOUNDED PRECEDING) AS sf,
         |    sum(value * pow(1.0 - 2.0/27.0, -r)) $OVER ROWS UNBOUNDED PRECEDING) AS ss,
         |    first_value(value) $OVER ROWS UNBOUNDED PRECEDING) AS x1
         |  FROM rn
         |), m AS (
         |  SELECT user_id, ts, event_id, value, r,
         |    pow(1.0 - 2.0/13.0, r) * ((2.0/13.0) * sf + x1)
         |      - pow(1.0 - 2.0/27.0, r) * ((2.0/27.0) * ss + x1) AS macd
         |  FROM acc
         |), acc2 AS (
         |  SELECT user_id, ts, event_id, value, r, macd,
         |    sum(macd * pow(1.0 - 2.0/10.0, -r)) $OVER ROWS UNBOUNDED PRECEDING) AS s2,
         |    first_value(macd) $OVER ROWS UNBOUNDED PRECEDING) AS m1
         |  FROM m
         |)
         |SELECT user_id, ts, event_id, value, macd,
         |  pow(1.0 - 2.0/10.0, r) * ((2.0/10.0) * s2 + m1) AS macd_signal,
         |  macd - pow(1.0 - 2.0/10.0, r) * ((2.0/10.0) * s2 + m1) AS macd_hist
         |FROM acc2""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id, ts, value,
        |  avg(value) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW) AS avg_2d
        |FROM events""".stripMargin,
    "q_window_rank" ->
      """SELECT event_id, user_id, ts, value,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_v,
        |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v,
        |  ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS quartile,
        |  percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS pr,
        |  rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rnk
        |FROM events""".stripMargin,
    // gaps-and-islands twin of session_window: diff == gap MERGES (<=),
    // matching Spark's touch-merges session semantics (SessionWindowSpec)
    "q_session" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              <= INTERVAL 4 HOUR THEN 0 ELSE 1 END AS new_s
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id,
        |  min(ts) AS session_start,
        |  max(ts) + INTERVAL 4 HOUR AS session_end,
        |  count(*) AS n_events,
        |  sum(value) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    // the engine's bucketed equi-join must equal the naive range join
    "q_range_join" ->
      """SELECT s.signup_id, e.error_id, s.signup_ts, e.error_ts
        |FROM (SELECT event_id AS signup_id, ts AS signup_ts FROM events
        |      WHERE event_type = 'signup') s
        |JOIN (SELECT event_id AS error_id, ts AS error_ts FROM events
        |      WHERE event_type = 'error') e
        |  ON e.error_ts >= s.signup_ts
        | AND e.error_ts < s.signup_ts + INTERVAL 2 HOUR""".stripMargin,
    "q_asof" ->
      """SELECT c.event_id, c.user_id, c.ts, p.value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin,
    "q_window_lag" ->
      s"""SELECT user_id, ts, event_id, value,
         |  lag(value, 1) $OVER) AS prev_value,
         |  value - lag(value, 1) $OVER) AS change
         |FROM events""".stripMargin,
    "q_window_trailing" ->
      s"""SELECT user_id, ts, event_id, value,
         |  avg(value) $OVER ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS trailing_avg
         |FROM events""".stripMargin,
    "q_window_forward" ->
      s"""SELECT user_id, ts, event_id, value,
         |  avg(value) $OVER ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING) AS forward_avg
         |FROM events""".stripMargin,
    "q_pct_change" ->
      s"""SELECT user_id, ts, event_id, value,
         |  CASE WHEN lag(value, 1) $OVER) <> 0.0
         |    THEN (value - lag(value, 1) $OVER)) / lag(value, 1) $OVER)
         |  END AS pct_change
         |FROM events""".stripMargin,
    "q_rsi" ->
      s"""WITH diffs AS (
         |  SELECT user_id, ts, event_id, value,
         |    value - lag(value, 1) $OVER) AS diff
         |  FROM events
         |), gl AS (
         |  SELECT user_id, ts, event_id, value,
         |    CASE WHEN diff > 0 THEN diff WHEN diff IS NOT NULL THEN 0.0 END AS gain,
         |    CASE WHEN diff < 0 THEN -diff WHEN diff IS NOT NULL THEN 0.0 END AS loss
         |  FROM diffs
         |), ag AS (
         |  SELECT user_id, ts, event_id, value,
         |    avg(gain) $OVER ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS avg_gain,
         |    avg(loss) $OVER ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS avg_loss
         |  FROM gl
         |)
         |SELECT user_id, ts, event_id, value,
         |  CASE WHEN avg_gain + avg_loss > 0.0
         |    THEN 100.0 * (avg_gain / (avg_gain + avg_loss)) END AS rsi
         |FROM ag""".stripMargin,
    // the weight is a SHARED Scala-computed literal (Indicators
    // .emaRefWeight) spliced into both engines — pow() never runs in
    // either plan, so its rounding can't split them; e-notation parses
    // as DOUBLE in DuckDB (a bare decimal would be DECIMAL)
    "q_ema_ref" -> {
      val wgt = Indicators.emaRefWeight(25)
      def dl(d: Double) = "%.17e".formatLocal(java.util.Locale.ROOT, d)
      s"""SELECT user_id, ts, event_id, value,
         |  value * ${dl(1.0 - wgt)}
         |    + avg(value) $OVER ROWS BETWEEN CURRENT ROW AND 24 FOLLOWING) * ${dl(wgt)}
         |    AS ema_ref
         |FROM events""".stripMargin
    },
    // the T3 batch twin: q_window_lag's change + q_rsi's Cutler CTE +
    // q_ema's closed form, fused over the same key/order
    "q_indicator_replay" ->
      s"""WITH rn AS (
         |  SELECT user_id, ts, event_id, value,
         |    row_number() $OVER) AS r,
         |    value - lag(value, 1) $OVER) AS diff
         |  FROM events
         |), acc AS (
         |  SELECT user_id, ts, event_id, value, r, diff,
         |    sum(value * pow(24.0/26.0, -r)) $OVER ROWS UNBOUNDED PRECEDING) AS s,
         |    first_value(value) $OVER ROWS UNBOUNDED PRECEDING) AS x1,
         |    avg(CASE WHEN diff > 0 THEN diff WHEN diff IS NOT NULL THEN 0.0 END)
         |      $OVER ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS avg_gain,
         |    avg(CASE WHEN diff < 0 THEN -diff WHEN diff IS NOT NULL THEN 0.0 END)
         |      $OVER ROWS BETWEEN 25 PRECEDING AND CURRENT ROW) AS avg_loss
         |  FROM rn
         |)
         |SELECT user_id, ts, event_id, value,
         |  diff AS change,
         |  CASE WHEN avg_gain + avg_loss > 0.0
         |    THEN 100.0 * (avg_gain / (avg_gain + avg_loss)) END AS rsi,
         |  pow(24.0/26.0, r) * ((2.0/26.0) * s + x1) AS ema
         |FROM acc""".stripMargin,
    // final-EMA-per-key twin: q_ema's closed form, last row per key.
    // (user_id, ts) is unique so ORDER BY ts == ORDER BY ts, event_id.
    "q_ema_seg" ->
      s"""WITH rn AS (
         |  SELECT user_id, value,
         |    row_number() $OVER) AS r
         |  FROM events
         |), acc AS (
         |  SELECT user_id, r,
         |    sum(value * pow(24.0/26.0, -r)) OVER (PARTITION BY user_id
         |      ORDER BY r ROWS UNBOUNDED PRECEDING) AS s,
         |    first_value(value) OVER (PARTITION BY user_id ORDER BY r) AS x1
         |  FROM rn
         |)
         |SELECT user_id, pow(24.0/26.0, r) * ((2.0/26.0) * s + x1) AS ema
         |FROM acc
         |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY r DESC) = 1""".stripMargin,
    "q_ema" ->
      s"""WITH rn AS (
         |  SELECT user_id, ts, event_id, value,
         |    row_number() $OVER) AS r
         |  FROM events
         |), acc AS (
         |  SELECT user_id, ts, event_id, value, r,
         |    sum(value * pow(24.0/26.0, -r)) $OVER ROWS UNBOUNDED PRECEDING) AS s,
         |    first_value(value) $OVER ROWS UNBOUNDED PRECEDING) AS x1
         |  FROM rn
         |)
         |SELECT user_id, ts, event_id, value,
         |  pow(24.0/26.0, r) * ((2.0/26.0) * s + x1) AS ema
         |FROM acc""".stripMargin)
}
