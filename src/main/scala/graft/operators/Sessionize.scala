package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch sessionization: group events into per-key activity sessions where
  * consecutive events less than `gap` apart share a session (the standard
  * gaps-and-islands semantics; the reference's serving layer slices fixed
  * calendar windows only — `api/main.py` OLHC ranges — so dynamic sessions
  * are an engine extension in the SURVEY §2.5 window family).
  *
  * Implementation is Spark's native `session_window` aggregation — the
  * same operator Structured Streaming uses for watermarked session state,
  * so the batch and streaming plans share semantics. Physically this is
  * ONE hash shuffle on the key, then per-partition sorted session merge
  * (UpdatingSessionsExec): no self-join, no window-function pre-pass, and
  * per-key series stay together under a 1000-executor scale-up exactly
  * like the other keyed window operators.
  *
  * A session's end is `last event ts + gap` (Spark's session_window
  * contract), and two events exactly `gap` apart DO merge: Spark merges
  * sessions whose windows touch (`start <= prev end`), not only ones
  * that overlap. The DuckDB oracle twin mirrors this with
  * `ts - lag(ts) <= gap → same session` (see
  * `graft.queries.WindowQueries`); [[graft.SessionWindowSpec]] pins the
  * boundary on crafted rows.
  */
object Sessionize {

  /** Session aggregates per (key, session).
    *
    * @param df     input with an event-time column
    * @param tsCol  event-time column name (TimestampType)
    * @param gap    session gap, e.g. "4 hours" (any CalendarInterval string)
    * @param keys   session key columns (sessions never span keys)
    * @param aggs   aggregate expressions, each aliased by the caller
    * @return one row per session: keys ++ session_start ++ session_end ++ aggs
    */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
                 keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
}
