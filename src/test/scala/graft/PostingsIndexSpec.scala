package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{PostingsIndex, Snapshot}

/** Streaming inverted-index maintenance: shard-per-batch writes,
  * exact shard merging (KMV union property), replay idempotence by
  * construction, manifest-safe compaction. */
class PostingsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"common uniq$i grp${i % 3}")).toDF("doc_id", "text")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList)).toSet

  test("shards merge to the direct index; replay no-op; compaction keeps pinned reads") {
    val dir = java.nio.file.Files.createTempDirectory("postings-idx").toString
    val idx = s"$dir/index"
    val batches = (0 until 4).map(b => docs(b * 10 until b * 10 + 10))
    batches.zipWithIndex.foreach { case (b, i) =>
      PostingsIndex.indexBatch(b, i, idx, cap = 4, snapshots = true)
    }
    val direct = rows(graft.queries.PipelineQueries.postingsIndexOf(
      batches.reduce(_ unionByName _), cap = 4))
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4)) == direct)
    // "common" spans all 40 docs; cap 4 forces true preview merging
    assert(direct.exists { case (t, df, p) =>
      t == "common" && df == 40L && p == List(0L, 1L, 2L, 3L) })

    // replay of an already-committed batch rewrites only its own shard,
    // and a version pinned BEFORE the replay keeps resolving — the
    // rewrite retires the prior files through the manifest instead of
    // deleting them out from under pinned readers
    val vPre = Snapshot.latestVersion(spark, idx).get
    PostingsIndex.indexBatch(batches(2), 2, idx, cap = 4, snapshots = true)
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4)) == direct,
      "replayed batch changed the index")
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4,
      version = Some(vPre))) == direct,
      "pinned pre-replay version broken by the shard rewrite")

    // compact all shards into one; a version pinned BEFORE compaction
    // still reads the identical index (retired shards resolve from
    // _stale), and the latest read is unchanged
    val v0 = Snapshot.latestVersion(spark, idx).get
    val (nb, na) = PostingsIndex.compactShards(spark, idx, cap = 4)
    assert(nb == 4 && na == 1, s"compaction $nb -> $na")
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4)) == direct)
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4,
      version = Some(v0))) == direct, "pinned pre-compaction read drifted")

    // appends after compaction keep composing
    PostingsIndex.indexBatch(docs(100 until 105), 4, idx, cap = 4,
      snapshots = true)
    val all = batches.reduce(_ unionByName _).unionByName(docs(100 until 105))
    val allRows = rows(graft.queries.PipelineQueries.postingsIndexOf(all, cap = 4))
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4)) == allRows)

    // crash-injected compaction recovery: a compaction that died
    // between its merged-shard write and its commit left an ORPHAN
    // m-shard no manifest references — re-running compactShards must
    // delete it first (merging it would double-count every df)
    PostingsIndex.mergeShards(
        spark.read.parquet(idx).drop("shard"), cap = 4)
      .write.parquet(s"$idx/shard=mCRASH")
    val (nb2, na2) = PostingsIndex.compactShards(spark, idx, cap = 4)
    assert(na2 == 1, s"recovery compaction $nb2 -> $na2")
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4)) == allRows,
      "orphan m-shard double-counted into the recovered index")
  }

  test("the live sink maintains the index across micro-batches with compaction") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("postings-sink").toString
    val idx = s"$dir/index"
    val mem = MemoryStream[(Long, String)]
    val q = PostingsIndex.startIndexSink(
      mem.toDF().toDF("doc_id", "text"), idx, s"$dir/ck",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      cap = 4, compactEvery = 2, snapshots = true)
    try {
      mem.addData((1L, "x alpha"), (2L, "x beta"))
      q.processAllAvailable()
      mem.addData((3L, "x alpha"), (4L, "y"))
      q.processAllAvailable() // batch 1 -> compaction fires
      mem.addData((5L, "y zeta"))
      q.processAllAvailable()
    } finally q.stop()
    val expect = rows(graft.queries.PipelineQueries.postingsIndexOf(
      Seq((1L, "x alpha"), (2L, "x beta"), (3L, "x alpha"), (4L, "y"),
        (5L, "y zeta")).toDF("doc_id", "text"), cap = 4))
    assert(rows(PostingsIndex.readIndex(spark, idx, cap = 4)) == expect)
    assert(expect.exists { case (t, df, p) =>
      t == "x" && df == 3L && p == List(1L, 2L, 3L) })
  }
}
