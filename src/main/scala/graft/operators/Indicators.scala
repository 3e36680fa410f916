package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical-indicator window operators — the analytical heart of the
  * reference (SURVEY.md §2.5), re-expressed as declarative Spark window
  * functions so all per-symbol math shares ONE hash shuffle on the
  * partition key (reference: `pipeline/util/util.py:76-105`,
  * `to_db.py:45-47`).
  *
  * Semantics decisions (SURVEY §2.5 "EMA semantics note"):
  *  - `change` / `pctChange`: close minus previous close per key
  *    (`to_db.py:45`, `warehouse.py:181`).
  *  - RSI: Cutler's form — simple moving averages of gain/loss over a
  *    trailing row frame (`util.py:84-105`), computed over a single
  *    window instead of the reference's re-shuffling outer join on date
  *    (`util.py:97`, a latent cross-symbol bug documented in SURVEY §2.3).
  *  - EMA: standard recursive `E_t = α·x_t + (1-α)·E_{t-1}`, seed = first
  *    value (the reference's batch path `util.py:76-82` disagrees with its
  *    own pandas path; we implement the published TA semantics). Two
  *    implementations: a closed-form window expression (oracle-checkable,
  *    see [[emaClosedForm]]) and an exact sequential fold
  *    ([[graft.operators.Ewma]]) for unbounded series.
  *
  * Scale: every operator here is `Window.partitionBy(key).orderBy(ord)` —
  * one shuffle by key, then per-partition sorted evaluation; no driver
  * collection, no UDFs, all codegen-friendly built-ins.
  */
object Indicators {

  private def w(key: Seq[String], ord: Seq[Column]) =
    Window.partitionBy(key.map(col): _*).orderBy(ord: _*)

  /** W1: previous value + absolute change per key (`to_db.py:45`). */
  def withChange(df: DataFrame, value: String, key: Seq[String], ord: Seq[Column]): DataFrame = {
    val prev = lag(col(value), 1).over(w(key, ord))
    df.withColumn("prev_value", prev)
      .withColumn("change", col(value) - prev)
  }

  /** W5: pandas pct_change equivalent (`warehouse.py:181`). Zero previous
    * value yields null (guarded: Spark 4 ANSI mode makes x/0 an error,
    * and an inf return would poison downstream aggregates). */
  def withPctChange(df: DataFrame, value: String, key: Seq[String], ord: Seq[Column]): DataFrame = {
    val prev = lag(col(value), 1).over(w(key, ord))
    df.withColumn("pct_change",
      when(prev =!= 0.0, (col(value) - prev) / prev))
  }

  /** W3: trailing row-frame mean over `n+1` rows (`util.py:93-94`). */
  def trailingAvg(df: DataFrame, value: String, n: Int, key: Seq[String],
                  ord: Seq[Column], as: String = "trailing_avg"): DataFrame =
    df.withColumn(as,
      avg(col(value)).over(w(key, ord).rowsBetween(-n, Window.currentRow)))

  /** W2: forward row-frame mean over `n` rows (`util.py:77-79`). */
  def forwardAvg(df: DataFrame, value: String, n: Int, key: Seq[String],
                 ord: Seq[Column], as: String = "forward_avg"): DataFrame =
    df.withColumn(as,
      avg(col(value)).over(w(key, ord).rowsBetween(Window.currentRow, n - 1)))

  /** Cutler's RSI over a trailing `n+1`-row frame (`util.py:84-105`).
    * RSI = 100·avgGain/(avgGain+avgLoss); null while no gain/loss history
    * (first row of each key) or when both averages are zero.
    */
  def withRsi(df: DataFrame, value: String, n: Int, key: Seq[String],
              ord: Seq[Column], as: String = "rsi"): DataFrame = {
    val win = w(key, ord)
    val frame = win.rowsBetween(-n, Window.currentRow)
    val diff = col(value) - lag(col(value), 1).over(win)
    val gain = when(diff > 0, diff).otherwise(when(diff.isNotNull, 0.0))
    val loss = when(diff < 0, -diff).otherwise(when(diff.isNotNull, 0.0))
    val avgGain = avg(gain).over(frame)
    val avgLoss = avg(loss).over(frame)
    // ratio-first keeps RSI exactly 100 when avgLoss = 0 (a/a == 1.0
    // exactly, whereas (100*a)/a can land at 100.00000000000001); the
    // zero-denominator guard (flat series) avoids ANSI-mode x/0 errors
    // and returns null — "no signal" — instead
    df.withColumn(as,
      when(avgGain + avgLoss > 0.0, lit(100.0) * (avgGain / (avgGain + avgLoss))))
  }

  /** Bollinger bands: trailing mean ± k·sample-stddev over an
    * `n+1`-row frame — same single-shuffle window family as RSI. */
  def withBollinger(df: DataFrame, value: String, n: Int, k: Double,
                    key: Seq[String], ord: Seq[Column]): DataFrame = {
    val frame = w(key, ord).rowsBetween(-n, Window.currentRow)
    val mid = avg(col(value)).over(frame)
    val sd = stddev_samp(col(value)).over(frame)
    df.withColumn("bb_mid", mid)
      .withColumn("bb_upper", mid + lit(k) * sd)
      .withColumn("bb_lower", mid - lit(k) * sd)
  }

  /** MACD: EMA(fast) − EMA(slow), signal = EMA(signalN) of the MACD
    * line, histogram = macd − signal. Three closed-form EMAs composed —
    * still one hash shuffle on the key (all windows share partitioning).
    */
  def withMacd(df: DataFrame, value: String, key: Seq[String], ord: Seq[Column],
               fast: Int = 12, slow: Int = 26, signalN: Int = 9): DataFrame = {
    val f = withEmaClosedForm(df, value, fast, key, ord, as = "_macd_f")
    val s = withEmaClosedForm(f, value, slow, key, ord, as = "_macd_s")
    val m = s.withColumn("macd", col("_macd_f") - col("_macd_s"))
      .drop("_macd_f", "_macd_s")
    withEmaClosedForm(m, "macd", signalN, key, ord, as = "macd_signal")
      .withColumn("macd_hist", col("macd") - col("macd_signal"))
  }

  /** The reference batch path's EMA quirk weight (SURVEY §2.5 note;
    * reference `util.py:76-82`): seeding with a FORWARD n-row mean and
    * then applying the smoothing recurrence n−1 times against the SAME
    * row's value collapses algebraically to a fixed convex combination —
    * weight `(1-α)^{n-1}` on the seed, the rest on the value. Computed
    * once here and spliced as a LITERAL into both the engine expression
    * and the oracle SQL, so pow() rounding can never split the two. */
  def emaRefWeight(n: Int): Double = math.pow(1.0 - 2.0 / (n + 1.0), n - 1)

  /** REFERENCE-COMPAT EMA — the literal `util.py:76-82` batch semantics
    * behind an explicit opt-in, making the engine's documented deviation
    * (standard recursive EMA, [[withEmaClosedForm]]) CHECKABLE instead of
    * only documented: `ema_ref = value·(1-w) + fwd_mean_n(value)·w` with
    * `w = (1-α)^{n-1}` ([[emaRefWeight]]). At n=25 this is
    * ≈ 0.854·value + 0.146·fwd-mean₂₅ — NOT a textbook EMA (the
    * reference disagrees with its own pandas path); use it only to
    * reproduce reference outputs bit-for-bit. Same single-shuffle window
    * topology as every other indicator; the forward frame is partial
    * near the series end (mean over the remaining rows), matching the
    * reference's frame semantics. */
  def withEmaReferenceCompat(df: DataFrame, value: String, n: Int,
                             key: Seq[String], ord: Seq[Column],
                             as: String = "ema_ref"): DataFrame = {
    val wgt = emaRefWeight(n)
    val seed = avg(col(value))
      .over(w(key, ord).rowsBetween(Window.currentRow, n - 1))
    df.withColumn(as, col(value) * lit(1.0 - wgt) + seed * lit(wgt))
  }

  /** Hard numeric ceiling of the closed form: `r^{-rn}` overflows double
    * past `e^{709.78}`, i.e. rn > 709/(−ln r). 0.98 safety margin keeps
    * the guard conservative. */
  def emaClosedFormRowBound(n: Int): Long = {
    val r = 1.0 - 2.0 / (n + 1.0)
    (0.98 * 709.0 / -math.log(r)).toLong
  }

  /** Recursive EMA via the exact closed form, as pure window expressions.
    *
    * With r = 1-α, rn the 1-based row number per key and
    * S_t = Σ_{i≤t} x_i·r^{-i}: E_t = r^t·(α·S_t + x_1), which equals the
    * recurrence E_1 = x_1; E_t = α·x_t + (1-α)·E_{t-1}.
    *
    * Numerics: r^{-rn} grows as e^{α·rn}, so this form is valid for
    * per-key series up to [[emaClosedFormRowBound]] rows (~8000/α) —
    * ample for daily bars (the reference's domain). The bound is ENFORCED
    * at runtime: a per-key series beyond it raises an error naming
    * [[Ewma.perRow]] (exact sequential fold, O(1) state, unbounded)
    * instead of silently emitting Inf/NaN into downstream aggregates.
    */
  def withEmaClosedForm(df: DataFrame, value: String, n: Int, key: Seq[String],
                        ord: Seq[Column], as: String = "ema"): DataFrame = {
    val alpha = 2.0 / (n + 1.0)
    require(n >= 2,
      s"withEmaClosedForm needs n >= 2 (n=$n makes r=0 and pow(0,-rn)=Inf" +
        " poisons the scan; an n=1 'EMA' is just the value itself)")
    val r = 1.0 - alpha
    val bound = emaClosedFormRowBound(n)
    val win = w(key, ord)
    val cum = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // row_number materialized first: window expressions cannot nest inside
    // another windowed aggregate. Same partition/order → still one shuffle.
    val rn = col("_ema_rn")
    val ema = pow(lit(r), rn) *
      (lit(alpha) * sum(col(value) * pow(lit(r), -rn)).over(cum) +
        first(col(value)).over(cum))
    // Two overflow guards, both raising instead of silently emitting
    // Inf/NaN into downstream aggregates:
    //  - rn > bound: r^-rn itself exceeds double range (row-count cause);
    //  - non-finite result from FINITE input: the value·r^-rn cumulative
    //    sum overflowed below the row bound (magnitude cause — e.g.
    //    VND-denominated 6e10 prices leave far less than e^709 of
    //    headroom). A non-finite INPUT anywhere in the running prefix
    //    propagates without raising, as the recursive definition would.
    //    NULL inputs count as finite — sum() skips them, so they cannot
    //    cause the overflow and must not mask the guard.
    val inputFinite = min(
      when(col(value).isNull ||
          abs(col(value).cast("double")) <= lit(Double.MaxValue), 1)
        .otherwise(0)).over(cum) === 1
    val resultNonFinite = !(abs(ema) <= lit(Double.MaxValue)) // catches NaN too
    df.withColumn("_ema_rn", row_number().over(win))
      .withColumn(as,
        when(rn > bound, raise_error(lit(
          s"withEmaClosedForm: per-key series exceeds the closed form's " +
            s"double-overflow bound ($bound rows at n=$n); use Ewma.perRow " +
            "for unbounded series")).cast("double"))
          .when(resultNonFinite && inputFinite, raise_error(lit(
            s"withEmaClosedForm: value·r^-rn overflowed double range below " +
              s"the $bound-row bound (large value magnitudes); use " +
              "Ewma.perRow, whose fold never leaves the value's scale"))
            .cast("double"))
          .otherwise(ema))
      .drop("_ema_rn")
  }
}
