package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{ArrayEqCount, Dedup}

/** Streaming NEAR-duplicate gate — the MinHash+LSH counterpart of
  * [[EventStream.dedupDocStream]] (which is exact-fingerprint only): a
  * continuously-ingesting pipeline drops documents that are near-dups of
  * anything already seen, not just byte-identical ones.
  *
  * Design: per micro-batch BATCH computation inside `foreachBatch`, with
  * the seen-state as LAKE TABLES — not operator state. That choice buys
  * three things a `flatMapGroupsWithState` formulation cannot: (a) the
  * admit decision needs ALL of a doc's bands (any-band collision), which
  * per-band keyed state cannot aggregate in one stateful pass; (b) the
  * state survives checkpoint loss and is inspectable/compactable like
  * any other table; (c) replays are idempotent end-to-end (below).
  *
  * == Bucketed layout — per-batch cost bounded by the batch, not |state|
  *
  * Every table the gate probes is HASH-BUCKETED into `buckets` partition
  * directories, and each batch reads ONLY the buckets its own keys hash
  * into (explicit directory selection — pruned buckets are never even
  * listed):
  *  - `state/bands/bucket=N` — (doc_id, band, band_hash) LSH band
  *    memberships, bucketed by pmod(band_hash, buckets); the collision
  *    probe joins on (band, band_hash).
  *  - `state/sigs/bucket=N`  — (doc_id, sig) full k-long MinHash
  *    signatures, bucketed by pmod(xxhash64(doc_id), buckets); read only
  *    for the doc_ids the band probe actually collided with.
  *  - `out/bucket=N`         — admitted rows, bucketed by
  *    pmod(xxhash64(doc_id), buckets); the replay anti-join reads only
  *    the buckets the batch's own doc_ids land in (the r5 full-column
  *    output scan is gone).
  * A micro-batch with m keys touches ≤ min(m, buckets) buckets, so
  * per-batch bytes ≈ touched/buckets × |table| — the bucket count is the
  * index fan-out. As the state grows, [[reshardState]] (a maintenance
  * operation, gate paused) rewrites the layout at a higher `buckets` so
  * per-bucket size stays near a target and per-batch probe cost stays
  * proportional to the BATCH's collision set — the LSM-style re-shard
  * answer to a plain-parquet lake having no secondary index; the sink's
  * `reshardBucketBytes` option runs it AUTOMATICALLY in the compaction
  * maintenance window when a bucket outgrows the target. (A
  * MERGE-capable table format with clustering gives this for free; the
  * bucketed layout is the table-format-free equivalent.)
  * [[LakeMaintenance.compactPartitioned]](dir, "bucket=") compacts the
  * one-file-per-batch accretion in all three layouts —
  * [[startNearDupSink]]'s `compactEvery` wires it in.
  *
  * == Admit rule — est-VERIFIED drops, batch and state symmetric
  *
  * A doc is DROPPED iff
  *  - some batch-LOCAL near-dup component contains it and it is not the
  *    component minimum (pairs est-verified at `threshold` via
  *    [[Dedup.minhashPairsFromSignatures]]); or
  *  - a STATE band collision pairs it with a seen doc whose full
  *    signature estimates Jaccard ≥ `threshold` (the seen signature is
  *    fetched from `state/sigs` by the colliding doc_ids only — r5
  *    dropped on ANY band collision unverified, a false-positive rate
  *    equal to the banding collision probability; both directions are
  *    now symmetric); or
  *  - it is too short to shingle (< shingleN tokens) and its whole-text
  *    fingerprint (md5-60 of lowercased text, null text ≡ empty) matches
  *    a seen short doc's — short docs carry a `band = -1` fingerprint
  *    row in `state/bands`, closing the r5 hole where unlimited exact
  *    copies of a short doc were admitted forever. Within a batch the
  *    minimum-id copy survives. Near-dup (not exact) short docs still
  *    pass: below shingleN tokens there is no signature to verify
  *    against, a documented limit.
  * The state registers the bands+fingerprints of EVERY processed doc —
  * survivors and dropped alike — so a later copy of a dropped document
  * still collides; signatures are registered for every shingleable doc.
  *
  * == Replay idempotence, by ordering
  *
  * Survivors append to the OUTPUT first (anti-joined against the
  * output's existing doc_ids in the touched buckets, so a replayed batch
  * re-admits nothing), the batch's band/fingerprint memberships and
  * signatures append to the STATE second. The state appends depend only
  * on the batch itself — never on the output anti-join — so a crash
  * between the appends cannot lose state: the stream cannot advance past
  * an uncommitted batch, the replay recomputes and re-appends identical
  * rows, and duplicate state rows are inert (the probes are
  * join-distinct). Exactly-once output, at-least-once state.
  *
  * Parameter binding: band hashes AND the bucket layout are
  * (shingleN, k, bands, seed, buckets)-bound — restarting the gate with
  * different parameters would silently never collide (or probe the wrong
  * directories). The state dir carries a `_gate_params` marker written
  * on first use and VERIFIED on every batch; a mismatch fails loudly.
  * ([[reshardState]] is the one legal way to change `buckets`; it
  * rewrites the marker.) A v1 (r5) state dir fails the same check —
  * it carries no signatures, so it cannot be est-verified against.
  *
  * Path probes check existence explicitly ([[TickIngest]]'s discipline);
  * real IO errors PROPAGATE and fail the batch so the streaming engine
  * retries — a swallowed read error would silently disable the gate or
  * the output's exactly-once for that batch. */
object NearDupGate {

  /** Default bucket fan-out — sized so fixture-scale states stay
    * readable while the pruning math is real; production gates size
    * this so |state|/buckets ≈ one scan-split (then re-shard as the
    * state grows). */
  val DefaultBuckets = 64

  private def keyBucket(c: Column, buckets: Int): Column =
    pmod(c, lit(buckets.toLong)).cast("int")

  private def idBucket(c: Column, buckets: Int): Column =
    pmod(xxhash64(c), lit(buckets.toLong)).cast("int")

  /** ONE copy of the dynamic-write clustering (curateBatch appends AND
    * reshardState rewrites): cluster by the bucket key so an append
    * adds at most one file per touched bucket, with an EXPLICIT
    * partition count so AQE cannot coalesce a small batch to a single
    * task that opens every file serially. */
  private def clusterByBucket(df: DataFrame, buckets: Int): DataFrame =
    df.repartition(
      math.max(1, math.min(buckets,
        df.sparkSession.sparkContext.defaultParallelism)),
      col("bucket"))

  /** Some(frame) iff ≥1 of the requested bucket dirs exists with parquet
    * part files — EXPLICIT directory selection (never a root listing),
    * so pruned buckets cost nothing; existence probes only, real IO
    * errors propagate. */
  private def readBuckets(spark: SparkSession, dir: String,
                          buckets: Seq[Int]): Option[DataFrame] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val dirs = buckets.sorted.map(b => new Path(root, s"bucket=$b"))
      .filter(p => fs.exists(p) && fs.listStatus(p)
        .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_.toString): _*))
  }

  /** One micro-batch through the gate. `batch` must carry
    * (doc_id: long-orderable, text: string). Returns the number of rows
    * THIS call admitted to the output (0 for an empty or fully-replayed
    * batch).
    *
    * `buckets` is the INITIAL layout fan-out, used only when this call
    * creates a fresh state; for an existing state the `_gate_params`
    * marker is authoritative (the bucket count is layout, not hash
    * semantics — [[reshardState]] legally changes it between runs, and
    * a caller-supplied stale count must not make probes silently read
    * the wrong directories). Hash parameters (shingleN, k, bands, seed)
    * are strictly verified against the marker as before. */
  def curateBatch(batch: DataFrame, outPath: String, statePath: String,
                  shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                  threshold: Double = 0.5,
                  buckets: Int = DefaultBuckets): Long = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = batch.sparkSession
    // every multi-consumer frame is persisted and fully materialized
    // (by the collects/count below) BEFORE the appends at the end — a
    // recompute after the writes could observe the just-written rows
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = { persisted += df.persist(); df }
    try {
      // null doc_ids are DROPPED up front, documented: a row with no
      // identity cannot participate in the idempotent output (a
      // null-keyed anti-join never matches, so it would re-append on
      // every replay) and its bucket hash is null (a poison pill for
      // the collected bucket lists). The id is the caller's row-key
      // contract; rows violating it are excluded like dropDuplicates
      // excludes later copies.
      val b = hold(batch.where(col("doc_id").isNotNull)
        .dropDuplicates("doc_id"))
      if (b.isEmpty) return 0L
      val nb = bindParams(spark, statePath, shingleN, k, bands, buckets)
      val sigs = hold(Dedup.minhashSignatures(
        Dedup.shinglesRaw(b, "doc_id", "text", shingleN), k))
      val banded = Dedup.signatureBands(sigs, k, bands)
      // short docs (< shingleN tokens — no signature): whole-text
      // fingerprint as a band = -1 row in the same probe keyspace;
      // null text fingerprints like empty text (md5(null) is null and a
      // null key would land in the default partition, invisible to the
      // bucket probe)
      val shortFps = b.join(sigs.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), lit(-1).as("band"),
          Dedup.md5Hash60(coalesce(lower(col("text")), lit(""))).as("band_hash"))
      val probe = hold(
        banded.select("doc_id", "band", "band_hash").unionByName(shortFps)
          .withColumn("bucket", keyBucket(col("band_hash"), nb)))
      val touched = probe.select("bucket").distinct().collect().map(_.getInt(0))
      val stateBands = readBuckets(spark, s"$statePath/bands", touched.toSeq)

      // ---- gate 1: state collisions ---------------------------------
      // short docs: exact fingerprint match drops outright
      val shortStateDropped = stateBands.map { sb =>
        probe.where(col("band") === -1)
          .join(sb.where(col("band") === -1).select("band", "band_hash"),
            Seq("band", "band_hash"), "left_semi")
          .select("doc_id")
      }
      // shingleable docs: band collision is only a CANDIDATE — fetch the
      // colliding seen docs' signatures (bucket-pruned by their ids) and
      // drop only when the estimated Jaccard clears the threshold,
      // symmetric with the batch-local pair path
      val verifiedStateDropped = stateBands.flatMap { sb =>
        val cand = hold(
          probe.where(col("band") >= 0)
            .join(sb.where(col("band") >= 0)
              .select(col("band"), col("band_hash"), col("doc_id").as("seen_id")),
              Seq("band", "band_hash"))
            .select(col("doc_id"), col("seen_id")).distinct())
        val seenBuckets = cand.select(idBucket(col("seen_id"), nb).as("sb"))
          .distinct().collect().map(_.getInt(0))
        readBuckets(spark, s"$statePath/sigs", seenBuckets.toSeq).map { ss =>
          cand
            .join(ss.select(col("doc_id").as("seen_id"), col("sig").as("seen_sig")),
              Seq("seen_id"))
            .join(sigs, Seq("doc_id"))
            .where(ArrayEqCount(col("sig"), col("seen_sig"))
              .cast("double") / k >= threshold)
            .select("doc_id").distinct()
        }
      }

      // ---- gate 2: batch-local components ---------------------------
      val localPairs = Dedup.minhashPairsFromSignatures(sigs, k, bands, threshold)
      val localDropped = Dedup.connectedComponents(localPairs, pairsDistinct = true)
        .where(col("doc_id") =!= col("component_rep"))
        .select("doc_id")
      // batch-local short-doc exact dedup: min id per fingerprint wins
      val shortLocalDropped = probe.where(col("band") === -1)
        .withColumn("_rn", row_number().over(
          Window.partitionBy("band_hash").orderBy("doc_id")))
        .where(col("_rn") > 1).select("doc_id")

      val gated = (Seq(localDropped, shortLocalDropped) ++
        shortStateDropped ++ verifiedStateDropped)
        .foldLeft(b) { (acc, d) => acc.join(d, Seq("doc_id"), "left_anti") }

      // ---- output, replay-idempotent and bucket-pruned --------------
      val gatedB = hold(gated.withColumn("bucket", idBucket(col("doc_id"), nb)))
      val outBuckets = gatedB.select("bucket").distinct().collect().map(_.getInt(0))
      val fresh = hold(readBuckets(spark, outPath, outBuckets.toSeq) match {
        case Some(existing) =>
          gatedB.join(existing.select("doc_id"), Seq("doc_id"), "left_anti")
        case None => gatedB
      })
      val admitted = fresh.count()
      // every dynamic-partition write CLUSTERS by the partition key
      // first: without it each of T tasks opens a writer per touched
      // bucket (T×buckets files per append, the classic dynamic-
      // partition write amplification — measured 6× the whole batch
      // cost at buckets=1024); clustered, an append adds at most one
      // file per touched bucket and the shuffle moves only batch-sized
      // data. The partition count is EXPLICIT: an expression-only
      // repartition lets AQE coalesce a small batch to one task, which
      // then opens every touched bucket's file SERIALLY (measured ~17 s
      // for a 3×1024-file seed) — pinning ~parallelism partitions keeps
      // clustering AND parallel writers
      def clustered(df: DataFrame): DataFrame =
        clusterByBucket(df, nb)
      clustered(fresh)
        .write.mode("append").partitionBy("bucket").parquet(outPath)
      // state second: the WHOLE batch's memberships (survivors and
      // dropped), independent of the output anti-join — see the
      // crash-window contract above
      clustered(probe)
        .write.mode("append").partitionBy("bucket").parquet(s"$statePath/bands")
      clustered(sigs.withColumn("bucket", idBucket(col("doc_id"), nb)))
        .write.mode("append").partitionBy("bucket").parquet(s"$statePath/sigs")
      admitted
    } finally persisted.foreach(_.unpersist())
  }

  /** Write-once / verify-always parameter marker in the state dir.
    * Returns the EFFECTIVE bucket count: the marker's for an existing
    * state (layout is marker-authoritative — [[reshardState]] legally
    * changes it between runs), `defaultBuckets` for a fresh one. Hash
    * parameters are strictly verified; a reshard fence
    * (`;resharding_to=`) fails every gate run until the reshard
    * completes. */
  private def bindParams(spark: SparkSession, statePath: String,
                         shingleN: Int, k: Int, bands: Int,
                         defaultBuckets: Int): Int = {
    val marker = new Path(statePath, "_gate_params")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      val got = readMarker(fs, marker)
      require(!got.contains(";resharding_to="),
        s"NearDupGate state at $statePath has a reshard in progress or " +
          s"crashed mid-way ($got) — rerun reshardState to complete it " +
          "before running the gate")
      val prefix = s"shingleN=$shingleN,k=$k,bands=$bands,seed=42,buckets="
      val bucketsRe = java.util.regex.Pattern.quote(prefix) + "(\\d+),v=2"
      val m = bucketsRe.r.findFirstMatchIn(got).filter(_.matched == got)
      require(m.isDefined,
        s"NearDupGate state at $statePath was built with ($got) but this " +
          s"gate runs (${paramString(shingleN, k, bands, defaultBuckets)}) " +
          "— band hashes are parameter-bound and the probe would silently " +
          "never collide; use a fresh statePath or matching parameters")
      m.get.group(1).toInt
    } else {
      writeMarker(fs, marker, paramString(shingleN, k, bands, defaultBuckets))
      defaultBuckets
    }
  }

  /** The state's current bucket fan-out, from the authoritative marker
    * (the [[startNearDupSink]] auto-reshard hook reads it to grow the
    * layout). */
  def currentBuckets(spark: SparkSession, statePath: String): Option[Int] = {
    val marker = new Path(statePath, "_gate_params")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else ",buckets=(\\d+),".r.findFirstMatchIn(readMarker(fs, marker))
      .map(_.group(1).toInt)
  }

  /** Complete an interrupted reshard if the marker carries a fence:
    * reruns [[reshardState]] toward the fenced target (the rerun IS the
    * crash recovery — it restores half-swapped dirs first). Returns
    * true iff a recovery ran. [[startNearDupSink]] calls this at the
    * top of every batch so a crash mid-auto-reshard self-heals on
    * stream restart instead of wedging on the fence. */
  def recoverReshard(spark: SparkSession, outPath: String,
                     statePath: String): Boolean = {
    val marker = new Path(statePath, "_gate_params")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) return false
    ";resharding_to=(\\d+)".r.findFirstMatchIn(readMarker(fs, marker)) match {
      case Some(m) => reshardState(spark, outPath, statePath, m.group(1).toInt); true
      case None => false
    }
  }

  private def paramString(shingleN: Int, k: Int, bands: Int, buckets: Int) =
    s"shingleN=$shingleN,k=$k,bands=$bands,seed=42,buckets=$buckets,v=2"

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem, marker: Path): String = {
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem, marker: Path,
                          s: String): Unit = {
    val out = fs.create(marker, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** MAINTENANCE: rewrite the gate's three bucketed layouts at a new
    * bucket count — the re-shard that keeps per-bucket size (and so
    * per-batch probe cost) bounded as the state grows. MUST run with the
    * gate stopped (it is the bucket-layout analog of a compaction
    * window).
    *
    * Crash contract, FENCE-FIRST: before any data moves, the
    * `_gate_params` marker is rewritten with a `;resharding_to=` fence —
    * from that instant ANY gate restart fails `bindParams` loudly (the
    * marker equals no runnable parameter string), so a half-moved
    * layout can never be silently probed, including the two windows a
    * marker-LAST ordering would miss (crash after a swap with the old
    * marker still matching old-bucket gates; crash between the two
    * renames leaving the layout dir absent, which a matching gate would
    * read as empty state). Each layout swap is
    * replacement-before-delete (full temp write → old moves aside →
    * temp renames in → aside deletes) and RE-ENTRANT: a rerun first
    * restores a half-swapped dir from its aside copy, so re-running
    * `reshardState` is the complete crash recovery; the clean marker is
    * written only after every swap finished. */
  def reshardState(spark: SparkSession, outPath: String, statePath: String,
                   newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1, got $newBuckets")
    val marker = new Path(statePath, "_gate_params")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(marker), s"no gate state at $statePath to reshard")
    // a `;resharding_to=` suffix from an interrupted run is accepted —
    // rerunning reshard IS the recovery path; the clean prefix carries
    // the authoritative old bucket count
    val old = readMarker(fs, marker).takeWhile(_ != ';')
    val re = ",buckets=(\\d+),".r
    val oldBuckets = re.findFirstMatchIn(old).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"unparseable _gate_params at $statePath: $old"))
    // FENCE: no gate may run until the clean marker returns
    writeMarker(fs, marker, old + s";resharding_to=$newBuckets")
    def swap(dir: String, rebucket: DataFrame => DataFrame): Unit = {
      val p = new Path(dir)
      val tmp = new Path(p.getParent, "." + p.getName + ".reshard_tmp")
      val aside = new Path(p.getParent, "." + p.getName + ".reshard_old")
      // recover a half-swapped prior attempt: if the layout dir is
      // gone, its aside copy is the authoritative data — restore it
      // BEFORE the cleanup deletes below (deleting aside while p is
      // missing would destroy the only copy)
      if (!fs.exists(p) && fs.exists(aside))
        require(fs.rename(aside, p), s"reshardState: could not restore $p from $aside")
      if (!fs.exists(p)) return
      fs.delete(tmp, true); fs.delete(aside, true)
      clusterByBucket(rebucket(spark.read.parquet(dir).drop("bucket")),
          newBuckets)
        .write.partitionBy("bucket").parquet(tmp.toString)
      if (!fs.rename(p, aside) || !fs.rename(tmp, p))
        throw new java.io.IOException(
          s"reshardState: swap failed for $dir; data intact in " +
            s"$aside and/or $tmp")
      fs.delete(aside, true)
    }
    swap(s"$statePath/bands",
      _.withColumn("bucket", keyBucket(col("band_hash"), newBuckets)))
    swap(s"$statePath/sigs",
      _.withColumn("bucket", idBucket(col("doc_id"), newBuckets)))
    swap(outPath,
      _.withColumn("bucket", idBucket(col("doc_id"), newBuckets)))
    writeMarker(fs, marker,
      old.replace(s"buckets=$oldBuckets", s"buckets=$newBuckets"))
  }

  /** The gate as a streaming sink: docs stream → near-dup-gated lake.
    *
    * `compactEvery` > 0 runs
    * [[LakeMaintenance.compactPartitioned]](…, "bucket=") over the
    * state and output layouts every that-many batches, inside
    * foreachBatch — where this stream's own appends are naturally
    * paused for the touched dirs (the compaction contract).
    *
    * `reshardBucketBytes` > 0 (requires `compactEvery`) makes the
    * bounded-probe-cost story AUTOMATIC: in the same maintenance
    * window, if the largest `state/bands` bucket exceeds the target,
    * [[reshardState]] rewrites all three layouts at 4× the current
    * fan-out (the marker is authoritative, so subsequent batches pick
    * the new count up without operator action). Per-batch probe cost
    * then stays ≈ touched-buckets × target bytes — proportional to the
    * batch's collision set — no matter how large the seen-state grows.
    * Running inside foreachBatch gives the reshard its required
    * gate-paused window for this stream; concurrent EXTERNAL readers
    * of the output still want a maintenance window or a table format. */
  def startNearDupSink(docs: DataFrame, outPath: String, statePath: String,
                       checkpoint: String,
                       trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                       shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                       threshold: Double = 0.5,
                       buckets: Int = DefaultBuckets,
                       compactEvery: Int = 0,
                       reshardBucketBytes: Long = 0L): StreamingQuery = {
    require(reshardBucketBytes == 0 || compactEvery > 0,
      "reshardBucketBytes needs compactEvery > 0 — resharding runs in " +
        "the compaction maintenance window")
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // a crash mid-auto-reshard left a fence: complete it before
        // curating (rerunning reshard IS the recovery), so a restarted
        // stream self-heals instead of failing the fence check forever
        recoverReshard(batch.sparkSession, outPath, statePath)
        curateBatch(batch, outPath, statePath, shingleN, k, bands,
          threshold, buckets)
        if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
          val s = batch.sparkSession
          LakeMaintenance.compactPartitioned(s, s"$statePath/bands", "bucket=")
          LakeMaintenance.compactPartitioned(s, s"$statePath/sigs", "bucket=")
          LakeMaintenance.compactPartitioned(s, outPath, "bucket=")
          if (reshardBucketBytes > 0 &&
              maxBucketBytes(s, s"$statePath/bands") > reshardBucketBytes)
            currentBuckets(s, statePath).foreach { cur =>
              reshardState(s, outPath, statePath, cur * 4)
            }
        }
        ()
      }
      .start()
  }

  /** Largest per-bucket byte size under a bucketed layout (0 when the
    * dir doesn't exist) — the auto-reshard trigger metric. Driver FS
    * work is O(buckets) listings, maintenance-window-only. */
  private def maxBucketBytes(spark: SparkSession, dir: String): Long = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0L
    val sizes = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(d => fs.listStatus(d.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum)
    if (sizes.isEmpty) 0L else sizes.max
  }
}
