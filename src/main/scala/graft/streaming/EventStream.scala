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

  /** Streaming exact dedup with BOUNDED state: content-fingerprint rows
    * (md5 of `textCol`, same fingerprint as the batch
    * [[graft.functions.Dedup]] operators) deduplicated via
    * `dropDuplicatesWithinWatermark` — dedup state for a fingerprint is
    * EVICTED once the watermark passes its last sighting plus `horizon`,
    * so state is O(distinct docs per horizon), not O(distinct docs ever).
    * That eviction is the difference between this and plain
    * `dropDuplicates` (which pins every key forever and OOMs on an
    * unbounded document stream): a duplicate arriving AFTER the horizon
    * is re-emitted — the contract a continuously-ingesting corpus
    * pipeline wants, because cross-horizon dedup belongs to the batch
    * compaction pass over the lake ([[graft.functions.Dedup.dedupKeepRows]]). */
  def dedupDocStream(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("_fp", md5(lower(col(textCol))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Ingest-time curation: per-row quality gate + Bloom-probe
    * decontamination — STATELESS by construction, so it composes with
    * any downstream streaming stage without watermark coupling.
    *
    * The benchmark's shingle set rides as driver-literal Bloom bits
    * ([[graft.functions.Bloom]], built once from the static held-out
    * suite by [[graft.functions.Bloom.shingleBloom]]): per document, the
    * shingle ARRAY is built in-row (transform over sequence — no
    * explode, no shuffle, no state) and a doc is dropped when ANY
    * shingle probes positive. Bloom false positives (~1e-4 at the
    * default sizing) drop a clean doc at ingest — the conservative
    * direction for a prefilter; the authoritative exact pass is the
    * batch decontamination over the lake
    * ([[graft.queries.CurationQueries.decontaminate]]), same contract
    * as streaming-vs-batch dedup above. */
  def curateDocStream(docs: DataFrame, benchBloom: Array[Long],
                      stopwords: Seq[String], minQuality: Double = 0.5,
                      textCol: String = "text", n: Int = 5,
                      bloomK: Int = 3): DataFrame = {
    import graft.functions.{Bloom, Dedup, TextAnalysis}
    val toks = TextAnalysis.tokens(col(textCol))
    val shingles = when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol), stopwords))
      .where(col("quality") >= minQuality)
      .where(!exists(shingles,
        s => Bloom.contains(Dedup.md5Hash60(s), benchBloom, bloomK)))
  }

  /** Ingest-time SEMANTIC decontamination gate — the embedding-space
    * sibling of [[curateDocStream]]'s Bloom probe: drop stream rows
    * whose embedding reaches `minCos` against ANY benchmark vector.
    * STATELESS by construction: the bench matrix (bounded — a static
    * eval suite) rides inside one fused
    * [[graft.functions.BestCosine]] projection, so the gate is a pure
    * per-row filter — no state store, no watermark coupling, identical
    * admit rule to the batch
    * [[graft.functions.Similarity.decontaminateSem]] (whose oracle pins
    * the semantics). Rows with a NULL embedding pass: the gate drops on
    * positive evidence only (the conservative-prefilter contract); the
    * authoritative pass is the batch row over the lake. */
  def semGateDocStream(docs: DataFrame, benchMatrix: Array[Array[Double]],
                       vecCol: String = "embedding",
                       minCos: Double = 0.95): DataFrame =
    if (benchMatrix.isEmpty) docs
    else docs.where(coalesce(
      graft.functions.BestCosine(col(vecCol), benchMatrix).getField("cos")
        < minCos,
      lit(true)))

  /** Event-time SESSION windows in streaming — activity bursts per key
    * closed by a `gap` of silence ([[graft.operators.Sessionize]] /
    * `q_session` is the batch twin): `session_window` merges
    * overlapping per-event candidate windows into variable-length
    * sessions inside Spark's session-aware state store, and the
    * watermark FINALIZES a session once event time passes its end +
    * gap — so in append mode a session emits exactly once, complete,
    * and state is O(open sessions), not O(events). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** STREAM-STREAM interval join — the last §2.8 "not present" shape
    * (the reference has no streaming joins at all): correlate two live
    * event streams on a key within an event-time window, e.g. ticks to
    * news mentions, clicks to impressions, alerts to fills. Both sides
    * carry watermarks, so Spark BOUNDS the join state: a buffered left
    * row is dropped once the right watermark passes `leftTs + within`
    * (and symmetrically), giving O(events per watermark horizon) state
    * regardless of stream length — the property a naive cache-the-other-
    * side implementation lacks. Inner join; rows pair when
    * `|leftTs − rightTs| ≤ within` on equal keys. Output columns:
    * key, l_ts, r_ts, plus each side's `payload` column renamed
    * l_/r_. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   key: String = "user_id",
                   tsCol: String = "ts", payload: String = "value",
                   within: String = "10 minutes",
                   lateness: String = "1 hour"): DataFrame = {
    val l = left.select(col(key).as("k"), col(tsCol).as("l_ts"),
        col(payload).as(s"l_$payload"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col(key).as("r_k"), col(tsCol).as("r_ts"),
        col(payload).as(s"r_$payload"))
      .withWatermark("r_ts", lateness)
    l.join(r, col("k") === col("r_k") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("k").as(key), col("l_ts"), col("r_ts"),
        col(s"l_$payload"), col(s"r_$payload"))
  }

  /** Ingest-time DSIR importance gate — the streaming form of the batch
    * `q_dsir_select` cut (r12 VERDICT item 5): admit a document iff its
    * importance score against the trained model reaches `minLogw`. The
    * model rides as a B-double driver literal
    * ([[graft.functions.TextAnalysis.dsirModelArray]] over the stored
    * ([[graft.functions.TextAnalysis.dsirModel]] → `q_dsir_stored`) or
    * incrementally-maintained
    * ([[graft.functions.TextAnalysis.dsirModelFromCounts]] →
    * `q_dsir_incr`) table), and scoring is the fused per-row fold
    * [[graft.functions.TextAnalysis.dsirScoreInRow]] — STATELESS by
    * construction (no explode, no join, no per-doc aggregation), so the
    * gate composes with any downstream stage without watermark
    * coupling, the [[semGateDocStream]] discipline. Admit semantics are
    * the batch scorer's thresholded logw ([[graft.StreamingSpec]] pins
    * stream ≡ batch admit parity); NULL text carries no evidence either
    * way and is DROPPED — an importance sampler admits on positive
    * evidence, the dual of the decontamination gates' drop-on-evidence.
    *
    * Thresholds, not ranks: the batch cut serves "top-100 by logw",
    * which a stream cannot evaluate (rank is corpus-global); a live
    * gate pins the logw VALUE at the batch cut's boundary — recalibrate
    * it when the model retrains, exactly like any drift-managed
    * acceptance threshold. */
  def dsirGateDocStream(docs: DataFrame, lr: Array[Double],
                        minLogw: Double,
                        textCol: String = "text"): DataFrame =
    docs.where(coalesce(
      graft.functions.TextAnalysis.dsirScoreInRow(col(textCol), lr)
        >= minLogw,
      lit(false)))
}
