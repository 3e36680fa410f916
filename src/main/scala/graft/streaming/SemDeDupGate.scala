package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.{NearestCentroid, Similarity, VectorExpressions}

/** Streaming SEMANTIC near-duplicate gate — the embedding-space
  * counterpart of [[NearDupGate]] (which gates on MinHash/text): a
  * continuously-ingesting pipeline drops vectors whose cosine against
  * anything already SEEN clears `minCos` — streaming SemDeDup, with the
  * seen-state as a coarse-list-partitioned LAKE table.
  *
  * The design mirrors the text gate where the problems are identical
  * and stays simpler where they are not:
  *  - state = `state/vecs/list=N` dirs keyed by the FIXED coarse
  *    quantizer ([[graft.functions.Similarity]]'s seeded deterministic
  *    centroids). A batch reads ONLY the lists its own vectors route to
  *    (`nprobe` nearest centroids per vector, explicit directory
  *    selection — pruned lists are never listed), so per-batch bytes
  *    track the batch's collision set, not |state|. `nlist` is the
  *    scale knob: thousands of lists at corpus scale keep per-list
  *    bytes near a target, exactly like the text gate's trie leaves.
  *  - the quantizer must be IDENTICAL across batches or probes would
  *    silently read the wrong lists — the first batch trains and
  *    PERSISTS it (`state/_centroids`, write-once, underscore-hidden);
  *    every later batch loads it. The analog of `_gate_params`.
  *  - admit rule, batch and state symmetric with batch [[graft
  *    .functions.Similarity.semDedup]]: within the batch, the higher id
  *    of any same-cluster pair with cosine ≥ `minCos` drops (min id
  *    survives a near-dup group); against state, a vector drops when
  *    ANY seen vector in its probed lists clears `minCos`. EVERY
  *    processed vector registers its (list, vid, v) row — survivors and
  *    dropped alike — so a later near-dup of a dropped vector still
  *    collides.
  *  - replay idempotence by the same ordering contract: survivors
  *    append to the OUTPUT first (anti-joined against the touched
  *    output lists' existing ids), the batch's state rows append second
  *    and depend only on the batch itself, so a crash between the
  *    appends replays into a no-op.
  *
  * vs the text gate: no split trie (list count is fixed at init — a
  * skewed list is re-balanced by re-training offline into a new state,
  * the retrain-to-a-new-dir contract the ANN artifacts document), no
  * est-verify step (cosine IS the exact decision, there is no cheaper
  * candidate signal to verify), no short-doc fallback (every vector has
  * full signal). */
object SemDeDupGate {

  private def centroidsPath(statePath: String) = s"$statePath/_centroids"
  private def vecsPath(statePath: String) = s"$statePath/vecs"

  /** Load the persisted quantizer, or train-and-persist it from this
    * batch (first call). Deterministic: the seeded first-`nlist`
    * centroids of [[Similarity.seededCentroids]]. */
  private def bindCentroids(spark: SparkSession, statePath: String,
                            v: DataFrame, nlist: Int): Array[Array[Double]] = {
    val dir = new Path(centroidsPath(statePath))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir) && fs.listStatus(dir)
        .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))) {
      spark.read.parquet(dir.toString).collect()
        .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    } else {
      import spark.implicits._
      val cents = Similarity.seededCentroids(v, nlist)
      cents.zipWithIndex.map { case (c, i) => (i + 1, c.toSeq) }.toSeq
        .toDF("pos", "centroid").coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      cents
    }
  }

  /** The (list, dir) pairs that exist with data under `root` — explicit
    * directory selection; the list id rides along because reading a
    * partition dir directly loses the dir-name column. */
  private def listDirs(spark: SparkSession, root: String,
                       lists: Seq[Int]): Seq[(Int, String)] = {
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootP)) return Nil
    lists.sorted.map(l => (l, new Path(rootP, s"list=$l")))
      .filter { case (_, p) => fs.exists(p) && fs.listStatus(p)
        .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")) }
      .map { case (l, p) => (l, p.toString) }
  }

  /** One micro-batch through the gate. `batch` must carry
    * (vid: long, v: array — float or double). Returns the number of
    * rows THIS call admitted (0 for an empty or fully-replayed batch). */
  def curateBatch(batch: DataFrame, outPath: String, statePath: String,
                  minCos: Double = 0.8, nlist: Int = 16,
                  nprobe: Int = 4): Long = {
    val spark = batch.sparkSession
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hold(df: DataFrame): DataFrame = { persisted += df.persist(); df }
    try {
      val b = hold(batch.where(col("vid").isNotNull).dropDuplicates("vid")
        .select(col("vid"), transform(col("v"), _.cast("double")).as("v")))
      if (b.isEmpty) return 0L
      val coarse = bindCentroids(spark, statePath, b, nlist)
      val assigned = hold(b.withColumn("list", NearestCentroid(col("v"), coarse)))

      // ---- gate 1: state collisions in the probed lists -------------
      val routed = hold(Similarity.routeQueries(
        b.select(col("vid").as("qid"), col("v").as("qv")), coarse, nprobe))
      val touched = routed.select("list").distinct()
        .collect().map(_.getInt(0)).toSeq
      val stateDropped = listDirs(spark, vecsPath(statePath), touched) match {
        case Nil => None
        case dirs =>
          // per-dir reads with the list id attached as a literal — the
          // partition column lives only in the dir name
          val seen = dirs.map { case (l, d) =>
            spark.read.parquet(d).select(col("vid").as("seen_id"),
              col("v").as("seen_v"), lit(l).as("list"))
          }.reduce(_ unionByName _)
          Some(routed.join(seen, Seq("list"))
            .where(VectorExpressions.cosineSim(col("qv"), col("seen_v")) >= minCos)
            .select(col("qid").as("vid")).distinct())
      }

      // ---- gate 2: batch-local pairwise drop (the semDedup rule) ----
      val localDropped = assigned.as("a").join(assigned.as("b"),
          col("a.list") === col("b.list") && col("a.vid") < col("b.vid"))
        .where(VectorExpressions.cosineSim(col("a.v"), col("b.v")) >= minCos)
        .select(col("b.vid").as("vid")).distinct()

      val gated = hold((Seq(localDropped) ++ stateDropped)
        .foldLeft(b)((acc, d) => acc.join(d, Seq("vid"), "left_anti")))

      // ---- output, replay-idempotent and list-pruned ----------------
      val gatedAssigned = hold(gated
        .withColumn("list", NearestCentroid(col("v"), coarse)))
      val outLists = gatedAssigned.select("list").distinct()
        .collect().map(_.getInt(0)).toSeq
      val fresh = hold(listDirs(spark, outPath, outLists) match {
        case Nil => gatedAssigned
        case dirs =>
          gatedAssigned.join(
            spark.read.parquet(dirs.map(_._2): _*).select("vid"),
            Seq("vid"), "left_anti")
      })
      val admitted = fresh.count()
      fresh.select(col("vid"), col("v"), col("list"))
        .repartition(math.min(nlist, 32), col("list"))
        .write.partitionBy("list").mode("append").parquet(outPath)
      // state second: the WHOLE batch registers, survivors and dropped
      // alike, independent of the output anti-join (the crash contract)
      assigned.select(col("vid"), col("v"), col("list"))
        .repartition(math.min(nlist, 32), col("list"))
        .write.partitionBy("list").mode("append").parquet(vecsPath(statePath))
      admitted
    } finally persisted.foreach(_.unpersist())
  }

  /** The gate as a streaming sink: vectors stream → semantically-deduped
    * lake, one [[curateBatch]] per micro-batch inside foreachBatch. */
  def startSemDeDupSink(vecs: DataFrame, outPath: String, statePath: String,
                        checkpoint: String,
                        trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                        minCos: Double = 0.8, nlist: Int = 16,
                        nprobe: Int = 4): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, outPath, statePath, minCos, nlist, nprobe)
        ()
      }
      .start()
}
