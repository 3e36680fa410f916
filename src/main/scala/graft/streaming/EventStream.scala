package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed streaming aggregation with watermarking — the
  * idiomatic replacement the reference lacks entirely (SURVEY.md §2.8
  * "✗ not present": no watermarks, no event-time windows, no late-data
  * policy — it processed every record at arrival). `hourlyRollup` in
  * [[graft.queries.Serving]] is this plan's batch twin; both group by the
  * event-time hour and produce the same aggregates.
  */
object EventStream {

  /** Tumbling event-time window aggregation. `lateness` bounds state:
    * windows older than the watermark are finalized and evicted, so state
    * size is O(active windows × event types) regardless of stream length. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum("value").as("sum_value"),
        avg("value").as("avg_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"), col("avg_value"))
}
