package graft

import org.apache.spark.sql.functions._
import graft.streaming.SemDeDupGate

/** Streaming SemDeDup — the embedding-space gate: cross-batch semantic
  * near-dups drop against coarse-list-partitioned lake state, replays
  * are idempotent, and near-dups of DROPPED vectors still collide. */
class SemDeDupGateSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32

  test("cross-batch semantic near-dups drop; replays idempotent; dropped still collide") {
    val rnd = new scala.util.Random(83)
    def vec() = Array.fill(dim)(rnd.nextGaussian())
    def noisy(v: Array[Double]) = v.map(x => x + 0.03 * rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("semgate").toString
    val (out, state) = (s"$dir/out", s"$dir/state")
    val base = (0 until 30).map(i => (i.toLong, vec())).toMap
    // batch 1: 30 vectors, id 25 replaced by a near-copy of id 3 —
    // the batch-local pairwise rule drops the higher id
    val batch1 = (0 until 30).map { i =>
      val v = if (i == 25) noisy(base(3L)) else base(i.toLong)
      (i.toLong, v.toSeq)
    }.toDF("vid", "v")
    assert(SemDeDupGate.curateBatch(batch1, out, state,
      minCos = 0.9, nlist = 4, nprobe = 2) == 29L)
    // batch 2: a near-dup of a seen survivor drops, a near-dup of the
    // DROPPED id-25 vector (≈ id 3) also drops — every processed vector
    // registered — and a fresh vector admits
    val batch2 = Seq(
      (100L, noisy(base(7L)).toSeq),  // near-dup of admitted: drop
      (101L, vec().toSeq),            // fresh: admit
      (102L, noisy(base(3L)).toSeq))  // near-dup of the dropped 25's twin: drop
      .toDF("vid", "v")
    assert(SemDeDupGate.curateBatch(batch2, out, state,
      minCos = 0.9, nlist = 4, nprobe = 2) == 1L)
    // replay of batch 2 is a no-op (output anti-join; state rows inert)
    assert(SemDeDupGate.curateBatch(batch2, out, state,
      minCos = 0.9, nlist = 4, nprobe = 2) == 0L)
    val outRows = spark.read.parquet(out)
    assert(outRows.select("vid").distinct().count() == 30L) // 29 + 1
    assert(!outRows.select("vid").as[Long].collect().contains(100L))
    // the lake layout is coarse-list-partitioned: probes read only the
    // routed lists
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lists = fs.listStatus(new org.apache.hadoop.fs.Path(s"$state/vecs"))
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(lists.nonEmpty && lists.forall(_.startsWith("list=")))
    // the quantizer is persisted once and stable across batches
    val cents = spark.read.parquet(s"$state/_centroids")
    assert(cents.count() == 4L)
    // a third batch against the bound state still gates correctly
    assert(SemDeDupGate.curateBatch(
      Seq((200L, noisy(base(11L)).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 0L)
  }

  test("maintenance: generic list-dir compaction keeps gate semantics") {
    // the state accretes one file per batch per touched list — the
    // text gate's problem, solved by the SAME generic kernel: the
    // layout is plain `list=N` dirs, so LakeMaintenance
    // .compactPartitioned needs no gate-specific code
    import graft.streaming.LakeMaintenance
    val rnd = new scala.util.Random(101)
    def vec() = Array.fill(dim)(rnd.nextGaussian())
    val dir = java.nio.file.Files.createTempDirectory("semgate-compact").toString
    val (out, state) = (s"$dir/out", s"$dir/state")
    val base = (0 until 8).map(i => (i.toLong, vec()))
    base.foreach { case (i, v) =>
      SemDeDupGate.curateBatch(Seq((i, v.toSeq)).toDF("vid", "v"),
        out, state, minCos = 0.9, nlist = 2, nprobe = 1)
    }
    val (parts, nb, na) = LakeMaintenance.compactPartitioned(
      spark, s"$state/vecs", "list=", maxFiles = 1)
    assert(parts >= 1 && na < nb, s"no compaction: $parts, $nb -> $na")
    // the compacted state still drops a near-dup and admits a fresh one
    assert(SemDeDupGate.curateBatch(
      Seq((100L, base(3)._2.map(x => x + 0.02 * rnd.nextGaussian()).toSeq))
        .toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 2, nprobe = 1) == 0L)
    assert(SemDeDupGate.curateBatch(
      Seq((101L, vec().toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 2, nprobe = 1) == 1L)
  }

  test("sink wiring: foreachBatch gate over a memory stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(89)
    def vec() = Array.fill(dim)(rnd.nextGaussian()).toSeq
    val dir = java.nio.file.Files.createTempDirectory("semgate-sink").toString
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = SemDeDupGate.startSemDeDupSink(
      mem.toDF().toDF("vid", "v"), s"$dir/out", s"$dir/state",
      s"$dir/ckpt", org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      minCos = 0.9, nlist = 2, nprobe = 1)
    val v0 = vec()
    mem.addData((0L, v0), (1L, vec()))
    q.awaitTermination(60000)
    val q2 = SemDeDupGate.startSemDeDupSink(
      mem.toDF().toDF("vid", "v"), s"$dir/out", s"$dir/state",
      s"$dir/ckpt", org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      minCos = 0.9, nlist = 2, nprobe = 1)
    mem.addData((2L, v0.map(x => x + 0.01 * rnd.nextGaussian())), // near-dup
      (3L, vec()))                                                // fresh
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$dir/out")
      .select("vid").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 3L))
  }
}
