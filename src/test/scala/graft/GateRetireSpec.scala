package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.streaming.{LakeMaintenance, NearDupGate, SemDeDupGate}

/** Tombstones in the streaming gates' MEMORY — the r14 verdict gap:
  * without a retire channel, a taken-down document's MinHash state (or
  * a retired representative vector) keeps suppressing admissible future
  * near-duplicates of content that no longer exists. Pinned here, for
  * BOTH gates:
  *  (a) a near-dup of a retired doc/vector ADMITS after the retire —
  *      immediately (probe-time subtraction), before any eviction;
  *  (b) eviction is replay-idempotent (a rerun over an already-evicted
  *      state is a no-op) and physically removes the retired rows from
  *      every layout, then consumes the channel;
  *  (c) a crash INSIDE the eviction window heals: the channel deletes
  *      last, so the rerun re-evicts, and the converging distinct-based
  *      kernel collapses the duplicate retained rows the worst swap
  *      window leaves behind. */
class GateRetireSpec extends SparkSpec {
  import spark.implicits._

  private def fs(p: String) = new Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- NearDupGate ---------------------------------------------------

  private val base = (0 until 60).map(i => s"tok$i").mkString(" ")
  private val other = (0 until 60).map(i => s"alpha$i").mkString(" ")
  private def nearDupOf(t: String, tok: String, repl: String) =
    t.replace(tok, repl)

  test("NearDupGate: a near-dup of a retired doc admits immediately; eviction scrubs the lake") {
    val dir = tmp("ndg-retire")
    val (out, state) = (s"$dir/out", s"$dir/state")
    assert(NearDupGate.curateBatch(
      Seq((1L, base), (3L, other)).toDF("doc_id", "text"), out, state) == 2L)
    // suppression works while doc 1 is live
    assert(NearDupGate.curateBatch(
      Seq((10L, nearDupOf(base, "tok57", "x"))).toDF("doc_id", "text"),
      out, state) == 0L)
    // retire the takedown CLUSTER — the admitted representative AND its
    // rejected copy: the text gate registers every PROCESSED doc's
    // bands (so exact copies of drops still drop), which means doc 10's
    // signature is a trace of the same taken-down content and must
    // leave with it; retiring only doc 1 would leave 10's rows
    // suppressing the neighborhood, by design. The SAME near-dup
    // content under a new id now ADMITS (probe subtraction — no
    // eviction has run yet).
    assert(NearDupGate.retireAppend(Seq(1L, 10L).toDF("doc_id"), state, 0L))
    assert(!NearDupGate.retireAppend(Seq(1L, 10L).toDF("doc_id"), state, 0L),
      "a replayed retire batch must skip")
    assert(NearDupGate.curateBatch(
      Seq((20L, nearDupOf(base, "tok57", "y"))).toDF("doc_id", "text"),
      out, state) == 1L)
    // near-dups of RETAINED docs still drop — subtraction is per-doc
    assert(NearDupGate.curateBatch(
      Seq((21L, nearDupOf(other, "alpha57", "z"))).toDF("doc_id", "text"),
      out, state) == 0L)
    // corpus readers: tombstone subtracts at read even pre-eviction
    val served = NearDupGate.readOutput(spark, out, Some(state))
      .select("doc_id").as[Long].collect().toSet
    assert(!served.contains(1L) && served.contains(3L) && served.contains(20L))
    assert(spark.read.option("recursiveFileLookup", "true").parquet(out)
      .select("doc_id").as[Long].collect().toSet.contains(1L),
      "pre-eviction the bytes are still in the lake (channel-subtracted only)")
    // eviction scrubs bands, sigs AND output, then consumes the channel
    val (_, rewritten) = NearDupGate.evictRetired(spark, out, state)
    assert(rewritten > 0, "eviction must rewrite the touched leaves")
    def docIdsUnder(root: String): Set[Long] =
      spark.read.option("recursiveFileLookup", "true").parquet(root)
        .select("doc_id").as[Long].collect().toSet
    assert(!docIdsUnder(out).contains(1L))
    assert(!docIdsUnder(s"$state/bands").contains(1L))
    assert(!docIdsUnder(s"$state/sigs").contains(1L))
    assert(!fs(state).exists(new Path(s"$state/retire")),
      "the channel must be consumed after a complete eviction")
    // replay-idempotent: a rerun over the evicted state is a no-op
    assert(NearDupGate.evictRetired(spark, out, state) == (0, 0))
    // post-eviction semantics: the cluster stays gated through its NEW
    // representative (20 admitted and registered), and the retained
    // state is intact — the normal rule over the healed lake
    assert(NearDupGate.curateBatch(
      Seq((30L, nearDupOf(base, "tok58", "w"))).toDF("doc_id", "text"),
      out, state) == 0L)
    assert(NearDupGate.curateBatch(
      Seq((31L, nearDupOf(other, "alpha58", "w"))).toDF("doc_id", "text"),
      out, state) == 0L)
  }

  test("NearDupGate: a crash inside the eviction window heals by rerun") {
    val dir = tmp("ndg-crash")
    val (out, state) = (s"$dir/out", s"$dir/state")
    assert(NearDupGate.curateBatch(
      Seq((1L, base), (2L, other), (5L, "short one")).toDF("doc_id", "text"),
      out, state) == 3L)
    assert(NearDupGate.retireAppend(Seq(1L).toDF("doc_id"), state, 0L))
    // simulate the WORST kernel crash window on one bands leaf: the
    // filtered files renamed in, the originals NOT yet deleted —
    // duplicated retained rows alongside the retired ones
    val f = fs(state)
    val bandsRoot = new Path(s"$state/bands")
    val leaf = f.listStatus(bandsRoot).filter(_.isDirectory)
      .map(_.getPath).find { p =>
        spark.read.parquet(p.toString)
          .where(col("doc_id") === 1L).head(1).nonEmpty
      }.get
    val originals = f.listStatus(leaf)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val aside = new Path(dir, "aside")
    f.mkdirs(aside)
    originals.foreach { o => // keep copies to re-introduce post-kernel
      org.apache.hadoop.fs.FileUtil.copy(f, o.getPath, f,
        new Path(aside, o.getPath.getName), false, true,
        spark.sparkContext.hadoopConfiguration)
    }
    val ids = Seq(1L).toDF("doc_id")
    assert(LakeMaintenance.evictFromDir(spark, leaf.toString, ids, "doc_id"))
    f.listStatus(aside).foreach { o => // the crash: originals reappear
      f.rename(o.getPath, new Path(leaf, o.getPath.getName))
    }
    val dup = spark.read.parquet(leaf.toString)
    assert(dup.count() > dup.distinct().count(),
      "the simulated window must actually duplicate retained rows")
    // the channel is still present (evictRetired deletes it LAST), so
    // the next maintenance window reruns and CONVERGES: no retired
    // rows, no duplicates, retained rows exactly once
    NearDupGate.evictRetired(spark, out, state)
    val healed = spark.read.parquet(leaf.toString)
    assert(healed.where(col("doc_id") === 1L).isEmpty)
    assert(healed.count() == healed.distinct().count(),
      "the rerun must collapse the crash window's duplicates")
    assert(!f.exists(new Path(s"$state/retire")))
    // and decisions over the healed state are right on both sides
    assert(NearDupGate.curateBatch(
      Seq((40L, nearDupOf(base, "tok57", "q"))).toDF("doc_id", "text"),
      out, state) == 1L)
    assert(NearDupGate.curateBatch(
      Seq((41L, nearDupOf(other, "alpha57", "q"))).toDF("doc_id", "text"),
      out, state) == 0L)
  }

  test("evictFromDir refuses a non-set channel: intra-file duplicates fail loudly") {
    // the kernel's distinct()-based crash convergence is only loss-free
    // on SET-semantics channels; a channel with legitimate duplicate
    // rows (duplicates INSIDE one file — the crash window only ever
    // duplicates ACROSS files) must be rejected before the rewrite can
    // silently collapse them
    val dir = tmp("evict-nonset")
    Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("doc_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      LakeMaintenance.evictFromDir(spark, dir, Seq(2L).toDF("doc_id"), "doc_id")
    }
    assert(ex.getMessage.contains("not set-semantics"), ex.getMessage)
    // untouched: the refusal must leave the channel bytes alone
    assert(spark.read.parquet(dir).count() == 3L)
    // and a dir whose duplicates are only CROSS-file (the legitimate
    // crash window) still rewrites fine
    val dir2 = tmp("evict-crashdup")
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir2)
    val f2 = fs(dir2)
    val part = f2.listStatus(new Path(dir2))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")).head
    org.apache.hadoop.fs.FileUtil.copy(f2, part.getPath, f2,
      new Path(dir2, "evicted-copy-00000.parquet"), false, true,
      spark.sparkContext.hadoopConfiguration)
    assert(LakeMaintenance.evictFromDir(spark, dir2,
      Seq(2L).toDF("doc_id"), "doc_id"))
    val healed = spark.read.parquet(dir2).collect()
    assert(healed.map(_.getLong(0)).toSeq == Seq(1L),
      "cross-file duplicates must collapse and the tombstone evict")
  }

  test("evictFromDirIfDense: under-threshold dirs carry byte-untouched, dense dirs rewrite") {
    val dir = tmp("evict-dense")
    (1L to 10L).map(i => (i, s"v$i")).toDF("doc_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val ids = Seq(3L, 7L).toDF("doc_id") // density 0.2
    // threshold above the density: carried, bytes untouched
    assert(LakeMaintenance.evictFromDirIfDense(spark, dir, ids, "doc_id",
      minDensity = 0.5) == ((false, true)))
    assert(spark.read.parquet(dir).count() == 10L)
    // threshold at/below the density: rewrites
    assert(LakeMaintenance.evictFromDirIfDense(spark, dir, ids, "doc_id",
      minDensity = 0.2) == ((true, false)))
    assert(spark.read.parquet(dir).select("doc_id").as[Long]
      .collect().toSet == (1L to 10L).toSet -- Set(3L, 7L))
    // no intersection at all: (false, false) either way
    assert(LakeMaintenance.evictFromDirIfDense(spark, dir, ids, "doc_id",
      minDensity = 0.5) == ((false, false)))
  }

  test("NearDupGate: density-thresholded eviction carries sparse leaves with admits still exact") {
    val dir = tmp("ndg-dense")
    val (out, state) = (s"$dir/out", s"$dir/state")
    assert(NearDupGate.curateBatch(
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"), out, state) == 2L)
    assert(NearDupGate.curateBatch(
      Seq((10L, nearDupOf(base, "tok57", "x"))).toDF("doc_id", "text"),
      out, state) == 0L)
    assert(NearDupGate.retireAppend(Seq(1L, 10L).toDF("doc_id"), state, 0L))
    // threshold 1.0: only fully-retired leaves rewrite; leaves mixing
    // retained doc 2's rows are CARRIED — channel must survive
    val (scanned, rewritten) =
      NearDupGate.evictRetired(spark, out, state, minEvictDensity = 1.0)
    assert(scanned > 0)
    assert(fs(state).exists(new Path(s"$state/retire")),
      "carried leaves must keep the channel")
    assert(rewritten < scanned, s"$rewritten of $scanned")
    // decisions stay EXACT over the partially-evicted state: the
    // retired neighborhood admits, the retained one still gates
    assert(NearDupGate.curateBatch(
      Seq((20L, nearDupOf(base, "tok57", "y"))).toDF("doc_id", "text"),
      out, state) == 1L)
    assert(NearDupGate.curateBatch(
      Seq((21L, nearDupOf(other, "alpha57", "z"))).toDF("doc_id", "text"),
      out, state) == 0L)
    // corpus readers stay tombstone-clean through the channel
    val served = NearDupGate.readOutput(spark, out, Some(state))
      .select("doc_id").as[Long].collect().toSet
    assert(!served.contains(1L) && served.contains(2L) && served.contains(20L))
    // the full pass on the compaction cadence folds the stragglers:
    // channel consumed, bytes gone everywhere
    NearDupGate.evictRetired(spark, out, state)
    assert(!fs(state).exists(new Path(s"$state/retire")))
    def docIdsUnder(root: String): Set[Long] =
      spark.read.option("recursiveFileLookup", "true").parquet(root)
        .select("doc_id").as[Long].collect().toSet
    assert(!docIdsUnder(s"$state/bands").contains(1L))
    assert(!docIdsUnder(out).contains(1L))
  }

  // ---- SemDeDupGate ---------------------------------------------------

  private val dim = 32

  test("SemDeDupGate: a retired representative stops suppressing its cluster; fenced eviction heals") {
    val rnd = new scala.util.Random(191)
    def vec() = Array.fill(dim)(rnd.nextGaussian())
    def noisy(v: Array[Double]) = v.map(x => x + 0.03 * rnd.nextGaussian())
    val dir = tmp("sdg-retire")
    val (out, state) = (s"$dir/out", s"$dir/state")
    val b = (0 until 12).map(_ => vec())
    assert(SemDeDupGate.curateBatch(
      (0 until 12).map(i => (i.toLong, b(i).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 12L)
    // suppression works while vid 3 is live
    assert(SemDeDupGate.curateBatch(
      Seq((100L, noisy(b(3)).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 0L)
    // retire vid 3 — under survivors-only registration it is the ONLY
    // row covering its cluster, so its near-dups must admit from the
    // next batch on
    assert(SemDeDupGate.retireAppend(Seq(3L).toDF("vid"), state, 0L))
    assert(!SemDeDupGate.retireAppend(Seq(3L).toDF("vid"), state, 0L))
    assert(SemDeDupGate.curateBatch(
      Seq((101L, noisy(b(3)).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 1L)
    // a retained representative still suppresses
    assert(SemDeDupGate.curateBatch(
      Seq((102L, noisy(b(7)).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 0L)
    // tombstone subtracts from corpus reads pre-eviction
    assert(!SemDeDupGate.readOutput(spark, out, Some(state))
      .select("vid").as[Long].collect().contains(3L))
    // fenced eviction scrubs state and output, consumes the channel
    val (_, rewritten) = SemDeDupGate.evictRetired(spark, out, state)
    assert(rewritten > 0)
    def vidsUnder(root: String): Set[Long] =
      spark.read.option("recursiveFileLookup", "true").parquet(root)
        .select("vid").as[Long].collect().toSet
    assert(!vidsUnder(out).contains(3L))
    assert(!vidsUnder(s"$state/vecs").contains(3L))
    assert(!fs(state).exists(new Path(s"$state/retire")))
    assert(SemDeDupGate.evictRetired(spark, out, state) == (0, 0))
    // post-eviction: the cluster stays admissible through its NEW
    // representative (101 registered), so another near-dup drops
    // against 101 — the normal gate rule over the healed state
    assert(SemDeDupGate.curateBatch(
      Seq((103L, noisy(b(3)).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 0L)
  }

  test("SemDeDupGate sink wiring: compactEvery runs eviction in the maintenance window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(29)
    def vec() = Array.fill(dim)(rnd.nextGaussian()).toSeq
    val dir = tmp("sdg-sink")
    val (out, state) = (s"$dir/out", s"$dir/state")
    assert(SemDeDupGate.curateBatch(
      (0 until 6).map(i => (i.toLong, vec())).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 6L)
    assert(SemDeDupGate.retireAppend(Seq(1L).toDF("vid"), state, 0L))
    val mem = MemoryStream[(Long, Seq[Double])]
    mem.addData((50L, vec()))
    val q = SemDeDupGate.startSemDeDupSink(
      mem.toDF.toDF("vid", "v"), out, state, s"$dir/ckpt",
      Trigger.AvailableNow(), minCos = 0.9, nlist = 4, nprobe = 2,
      compactEvery = 1)
    q.awaitTermination(60000)
    // the maintenance window consumed the channel and scrubbed vid 1
    assert(!fs(state).exists(new Path(s"$state/retire")))
    assert(!spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$state/vecs").select("vid").as[Long].collect().contains(1L))
  }

  test("SemDeDupGate: a crash mid-eviction heals through recoverMaintenance") {
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(dim)(rnd.nextGaussian())
    def noisy(v: Array[Double]) = v.map(x => x + 0.03 * rnd.nextGaussian())
    val dir = tmp("sdg-crash")
    val (out, state) = (s"$dir/out", s"$dir/state")
    val b = (0 until 8).map(_ => vec())
    assert(SemDeDupGate.curateBatch(
      (0 until 8).map(i => (i.toLong, b(i).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 8L)
    assert(SemDeDupGate.retireAppend(Seq(2L).toDF("vid"), state, 0L))
    // simulate a crash at the very top of the window: the fence is
    // down, nothing was rewritten, the channel is intact
    val fenceF = new Path(state, "_sem_fence")
    val f = fs(state)
    val os = f.create(fenceF, true)
    os.write("evicting".getBytes("UTF-8")); os.close()
    // the gate refuses to run while the fence is down
    val ex = intercept[IllegalStateException] {
      SemDeDupGate.curateBatch(
        Seq((200L, vec().toSeq)).toDF("vid", "v"),
        out, state, minCos = 0.9, nlist = 4, nprobe = 2)
    }
    assert(ex.getMessage.contains("evicting"))
    // recovery completes the eviction and clears the fence
    assert(SemDeDupGate.recoverMaintenance(spark, out, state))
    assert(!f.exists(fenceF))
    assert(!f.exists(new Path(s"$state/retire")))
    assert(!spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$state/vecs").select("vid").as[Long].collect().contains(2L))
    // a near-dup of the evicted vector now admits
    assert(SemDeDupGate.curateBatch(
      Seq((201L, noisy(b(2)).toSeq)).toDF("vid", "v"),
      out, state, minCos = 0.9, nlist = 4, nprobe = 2) == 1L)
    // and the OTHER crash shape — fence down, channel already consumed
    // (death between the channel delete and the fence clear) — heals to
    // a cleared fence without re-evicting
    val os2 = f.create(fenceF, true)
    os2.write("evicting".getBytes("UTF-8")); os2.close()
    assert(SemDeDupGate.recoverMaintenance(spark, out, state))
    assert(!f.exists(fenceF))
  }
}
