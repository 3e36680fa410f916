package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.Dedup

/** Streaming NEAR-duplicate gate — the MinHash+LSH counterpart of
  * [[EventStream.dedupDocStream]] (which is exact-fingerprint only): a
  * continuously-ingesting pipeline drops documents that are near-dups of
  * anything already seen, not just byte-identical ones.
  *
  * Design: per micro-batch BATCH computation inside `foreachBatch`, with
  * the seen-state as a LAKE TABLE of LSH band memberships — not operator
  * state. That choice buys three things a `flatMapGroupsWithState`
  * formulation cannot: (a) the admit decision needs ALL of a doc's bands
  * (any-band collision), which per-band keyed state cannot aggregate in
  * one stateful pass; (b) the state survives checkpoint loss and is
  * inspectable/compactable like any other table; (c) replays are
  * idempotent end-to-end (below). Per batch: one signature pipeline over
  * the batch, one semi-join against the state's (band, band_hash) keys,
  * one batch-local pair expansion — the batch is small (seconds of
  * stream); the state table is the only thing that grows, at ~`bands`
  * longs per SEEN doc.
  *
  * Admit rule (conservative-drop, the [[EventStream.curateDocStream]]
  * Bloom philosophy): a doc is DROPPED if any LSH band collides with a
  * previously seen doc's band (probable near-dup, no verification pass —
  * the false-positive rate is the banding collision probability), or if
  * it is a non-minimum member of a batch-local near-dup component (those
  * pairs ARE est-verified at `threshold`, via the same
  * [[Dedup.minhashPairsFromSignatures]] the batch operators use). Docs
  * too short to shingle (< n tokens) carry no signature and pass the
  * gate. The state registers the bands of EVERY processed doc —
  * survivors and dropped alike — so a later copy of a dropped document
  * still collides (registering only survivors would re-admit exact
  * copies of chain-dropped members).
  *
  * Replay idempotence, by ordering: survivors append to the OUTPUT first
  * (anti-joined against the output's existing doc_ids, so a replayed
  * batch re-admits nothing), the batch's band memberships append to the
  * STATE second. The state append depends only on the batch itself —
  * never on the output anti-join — so a crash between the two appends
  * cannot lose a batch's state: the replay recomputes and appends the
  * identical rows, and duplicate state rows are harmless to a semi-join
  * probe. Exactly-once output, at-least-once state.
  *
  * Parameter binding: band hashes are (shingleN, k, bands, seed)-bound —
  * restarting the gate with different parameters would make probes
  * against the old state silently never collide. The state dir carries a
  * `_gate_params` marker written on first use and VERIFIED on every
  * batch; a mismatch fails loudly. (The seed is [[Dedup]]'s fixed
  * default, 42.)
  *
  * Path probes check existence explicitly ([[TickIngest]]'s discipline);
  * real IO errors PROPAGATE and fail the batch so the streaming engine
  * retries — a swallowed read error would silently disable the gate or
  * the output's exactly-once for that batch.
  *
  * Scale shape: the state probe reads only (band, band_hash) — at 10⁹
  * seen docs that is ~16·10⁹ rows of two longs, a bucketed/Z-ordered
  * table in production; the semi-join is band_hash-keyed and never
  * touches document text. The output-side replay anti-join reads the
  * output's doc_id column in full each batch — correct but growing;
  * it cannot be time-pruned (a restart after arbitrary downtime replays
  * a batch whose rows landed arbitrarily long ago), so the production
  * move is a MERGE-capable table format (or a doc_id-bucketed output
  * whose buckets broadcast) once the output outgrows a column scan.
  * [[LakeMaintenance.compactLake]]-style compaction applies to both
  * output and state dirs. */
object NearDupGate {

  /** One micro-batch through the gate. `batch` must carry
    * (doc_id: long-orderable, text: string). Returns the number of rows
    * THIS call admitted to the output (0 for an empty or fully-replayed
    * batch). */
  def curateBatch(batch: DataFrame, outPath: String, statePath: String,
                  shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                  threshold: Double = 0.5): Long = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration

    /** Some(read) iff the dir exists AND holds parquet part files;
      * existence probes only — real IO errors propagate. */
    def parquetIn(p: String): Option[DataFrame] = {
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val has = fs.exists(hp) && fs.listStatus(hp)
        .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (has) Some(spark.read.parquet(p)) else None
    }

    val b = batch.dropDuplicates("doc_id").persist()
    try {
      if (b.isEmpty) return 0L
      bindParams(spark, statePath, shingleN, k, bands)
      val sigs = Dedup.minhashSignatures(
        Dedup.shinglesRaw(b, "doc_id", "text", shingleN), k).persist()
      try {
        val banded = Dedup.signatureBands(sigs, k, bands)
        // gate 1: any-band collision with the seen state (semi-join —
        // duplicate state rows are inert, no distinct needed)
        val stateCollided = parquetIn(statePath).map { seen =>
          banded.join(seen.select("band", "band_hash"),
            Seq("band", "band_hash"), "left_semi")
            .select("doc_id")
        }
        // gate 2: batch-local near-dup components — min id survives
        val localPairs = Dedup.minhashPairsFromSignatures(sigs, k, bands, threshold)
        val localDropped = Dedup.connectedComponents(localPairs, pairsDistinct = true)
          .where(col("doc_id") =!= col("component_rep"))
          .select("doc_id")
        val gated = stateCollided
          .foldLeft(b.join(localDropped, Seq("doc_id"), "left_anti")) {
            (acc, sc) => acc.join(sc, Seq("doc_id"), "left_anti")
          }
        // output first, replay-idempotent on doc_id. PERSISTED: the
        // admit decision is computed ONCE — its plan reads outPath, and
        // recomputing it after the write below could observe the just-
        // written rows
        val fresh = (parquetIn(outPath) match {
          case Some(existing) =>
            gated.join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
          case None => gated
        }).persist()
        try {
          val admitted = fresh.count()
          fresh.write.mode("append").parquet(outPath)
          // state second: the WHOLE batch's band memberships (survivors
          // and dropped), independent of the output anti-join — see the
          // crash-window contract above
          banded.write.mode("append").parquet(statePath)
          admitted
        } finally fresh.unpersist()
      } finally sigs.unpersist()
    } finally b.unpersist()
  }

  /** Write-once / verify-always parameter marker in the state dir. */
  private def bindParams(spark: org.apache.spark.sql.SparkSession,
                         statePath: String, shingleN: Int, k: Int,
                         bands: Int): Unit = {
    val marker = new Path(statePath, "_gate_params")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val expect = s"shingleN=$shingleN,k=$k,bands=$bands,seed=42"
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      require(got == expect,
        s"NearDupGate state at $statePath was built with ($got) but this " +
          s"gate runs ($expect) — band hashes are parameter-bound and the " +
          "probe would silently never collide; use a fresh statePath or " +
          "matching parameters")
    } else {
      val out = fs.create(marker, true)
      try out.write(expect.getBytes("UTF-8")) finally out.close()
    }
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
