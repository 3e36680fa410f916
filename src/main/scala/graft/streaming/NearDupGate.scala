package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Dedup

/** Streaming NEAR-duplicate gate — the MinHash+LSH counterpart of
  * [[EventStream.dedupDocStream]] (which is exact-fingerprint only): a
  * continuously-ingesting pipeline drops documents that are near-dups of
  * anything already admitted, not just byte-identical ones.
  *
  * Design: per micro-batch BATCH computation inside `foreachBatch`, with
  * the seen-state as a LAKE TABLE of LSH band memberships — not operator
  * state. That choice buys three things a `flatMapGroupsWithState`
  * formulation cannot: (a) the admit decision needs ALL of a doc's bands
  * (any-band collision), which per-band keyed state cannot aggregate in
  * one stateful pass; (b) the state survives checkpoint loss and is
  * inspectable/compactable like any other table; (c) replays are
  * idempotent end-to-end (below). Per batch: one signature pipeline over
  * the batch, one broadcast-able semi-join against the state's
  * (band, band_hash) keys, one batch-local pair expansion — the batch is
  * small (seconds of stream), the state table is the only thing that
  * grows, at ~`bands` longs per admitted doc.
  *
  * Admit rule (conservative-drop, the [[EventStream.curateDocStream]]
  * Bloom philosophy): a doc is DROPPED if any LSH band collides with an
  * admitted doc's band (probable near-dup, no verification pass — the
  * false-positive rate is the banding collision probability), or if it is
  * a non-minimum member of a batch-local near-dup component (those pairs
  * ARE est-verified at `threshold`, via the same
  * [[Dedup.minhashPairsFromSignatures]] the batch operators use). Docs
  * too short to shingle (< n tokens) carry no signature and pass the
  * gate.
  *
  * Replay idempotence, by ordering: survivors append to the OUTPUT first
  * (anti-joined against the output's existing doc_ids, so a replayed
  * batch re-admits nothing), band memberships append to the STATE second
  * (duplicate state rows are harmless — the probe is a semi-join). A
  * crash between the two appends replays the batch: its docs now
  * anti-join out against the output, and the state append completes —
  * exactly-once output, at-least-once state, correct gate either way.
  *
  * Scale shape: the state probe reads only (band, band_hash) — at 10⁹
  * admitted docs that is ~16·10⁹ rows of two longs, a bucketed/
  * Z-ordered table in production; the semi-join is band_hash-keyed and
  * never touches document text. [[LakeMaintenance.compactLake]]-style
  * compaction applies to both output and state dirs. */
object NearDupGate {

  /** One micro-batch through the gate. `batch` must carry
    * (doc_id: long-orderable, text: string). Returns the TOTAL admitted
    * row count in the output after this batch (for tests/metrics). */
  def curateBatch(batch: DataFrame, outPath: String, statePath: String,
                  shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                  threshold: Double = 0.5): Long = {
    val spark = batch.sparkSession
    val b = batch.dropDuplicates("doc_id").persist()
    try {
      if (b.isEmpty) return 0L
      val sigs = Dedup.minhashSignatures(
        Dedup.shinglesRaw(b, "doc_id", "text", shingleN), k).persist()
      try {
        val banded = Dedup.signatureBands(sigs, k, bands)
        // gate 1: any-band collision with the admitted state
        val stateCollided = scala.util.Try(spark.read.parquet(statePath))
          .toOption match {
          case Some(seen) =>
            banded.join(seen.select("band", "band_hash").distinct(),
              Seq("band", "band_hash"), "left_semi")
              .select("doc_id").distinct()
          case None => spark.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0)
        }
        // gate 2: batch-local near-dup components — min id survives
        val localPairs = Dedup.minhashPairsFromSignatures(sigs, k, bands, threshold)
        val localDropped = Dedup.connectedComponents(localPairs, pairsDistinct = true)
          .where(col("doc_id") =!= col("component_rep"))
          .select("doc_id")
        val survivors = b
          .join(stateCollided, Seq("doc_id"), "left_anti")
          .join(localDropped, Seq("doc_id"), "left_anti")
        // output first, replay-idempotent on doc_id. PERSISTED: the
        // admit decision must be computed ONCE — its plan reads outPath,
        // and recomputing it after the write below could see the just-
        // written rows and anti-join this batch's own docs out of the
        // state append
        val fresh = (scala.util.Try(spark.read.parquet(outPath)).toOption match {
          case Some(existing) =>
            survivors.join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
          case None => survivors
        }).persist()
        try {
          fresh.write.mode("append").parquet(outPath)
          // state second: admitted docs' band memberships (duplicates
          // from an at-least-once replay are harmless to the probe)
          banded.join(fresh.select("doc_id"), Seq("doc_id"), "left_semi")
            .write.mode("append").parquet(statePath)
        } finally fresh.unpersist()
        spark.read.parquet(outPath).count()
      } finally sigs.unpersist()
    } finally b.unpersist()
  }

  /** The gate as a streaming sink: docs stream → near-dup-gated lake. */
  def startNearDupSink(docs: DataFrame, outPath: String, statePath: String,
                       checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                       shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                       threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, outPath, statePath, shingleN, k, bands, threshold)
        ()
      }
      .start()
}
