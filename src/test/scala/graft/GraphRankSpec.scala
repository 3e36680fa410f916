package graft

import org.apache.spark.sql.functions._
import graft.functions.GraphRank

/** Fixed-iteration PageRank: closed-form graphs, a driver-side
  * reference recurrence, mass conservation, and the symmetric-clique
  * tie discipline the top-k cut depends on. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(pairs: Seq[(Long, Long)], iters: Int = 8): Map[Long, Double] =
    GraphRank.pageRank(pairs.toDF("a", "b"), "a", "b", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** The same recurrence, driver-side: undirected damped PageRank with
    * fixed iterations — the independent oracle for arbitrary graphs. */
  private def refRanks(pairs: Seq[(Long, Long)], iters: Int,
                       d: Double = 0.85): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = out.keys.toSeq.sorted
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / out(src) }.sum
      }
      r = nodes.map(v => v -> ((1 - d) / n + d * inflow.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("two-node graph is the exact fixed point: both ranks 0.5 at every iteration") {
    // r0 = 1/2 and each step maps r -> 0.075 + 0.85*r_other = 0.5 exactly
    for (it <- Seq(1, 8)) {
      val r = ranks(Seq(1L -> 2L), iters = it)
      assert(r == Map(1L -> 0.5, 2L -> 0.5), s"iters=$it: $r")
    }
  }

  test("star graph: the hub out-ranks the leaves; symmetric leaves are BIT-identical") {
    val r = ranks(Seq(10L -> 1L, 10L -> 2L, 10L -> 3L))
    assert(r(10L) > r(1L))
    // topologically identical leaves must agree to the BIT — each leaf's
    // inflow is the single term d*r(hub)/3, so no summation-order noise;
    // this exactness is what makes the top-k doc_id tie-break meaningful
    assert(r(1L) == r(2L) && r(2L) == r(3L), r.toString)
    // no dangling mass on an undirected graph: ranks sum to 1
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("matches the driver-side reference recurrence on an irregular graph") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L,
                    5L -> 6L, 6L -> 7L, 5L -> 7L, 7L -> 8L, 2L -> 5L)
    val got = ranks(pairs)
    val want = refRanks(pairs, iters = 8)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"node $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("a 4-clique's equal ranks make the rounded top-k cut deterministic by doc_id") {
    // every pair of {1,2,3,4}: all four ranks are exactly equal in exact
    // arithmetic; the serving cut orders by round(rank, 6) then id, so
    // the selected ids are the SMALLEST ones, never float-noise winners
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield a -> b
    val df = GraphRank.pageRank((clique ++ Seq(5L -> 6L)).toDF("a", "b"), "a", "b")
      .orderBy(round(col("rank"), 6).desc, col("node").asc).limit(3)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("iteration count is honored: 1 iteration differs from 8 on an asymmetric graph") {
    val pairs = Seq(10L -> 1L, 10L -> 2L, 1L -> 2L, 2L -> 3L)
    val r1 = ranks(pairs, iters = 1)
    val r8 = ranks(pairs, iters = 8)
    assert(r1 != r8)
    assert(math.abs(refRanks(pairs, 1)(3L) - r1(3L)) < 1e-12)
  }

  test("incremental pair shards: rank over the union equals a batch recompute; replay and torn shards heal") {
    // the q_cms_incr/q_dsir_incr maintenance discipline on the graph
    // family: pairsAppend claims batch-named shards under _SUCCESS,
    // pageRankFromPairs derives the rank at read over the union
    val dir = java.nio.file.Files.createTempDirectory("pr-incr").toString
    val all = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L,
                  5L -> 6L, 6L -> 7L, 5L -> 7L, 7L -> 8L, 2L -> 5L)
    val batches = all.grouped(4).toSeq // 3 disjoint pair slices
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(GraphRank.pairsAppend(b.toDF("a", "b"), "a", "b", dir, i))
    }
    def fromShards(): Map[Long, Double] =
      GraphRank.pageRankFromPairs(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val incr = fromShards()
    val batch = ranks(all)
    assert(incr.keySet == batch.keySet)
    // same pair set, same fixed iteration — only partial-aggregation
    // order can differ, far inside the serving cut's 6-decimal rounding
    incr.foreach { case (k, v) =>
      assert(math.abs(v - batch(k)) < 1e-12, s"node $k: $v vs ${batch(k)}")
    }
    // REPLAY: re-appending an existing batch id returns false and
    // changes nothing (no duplicated edges, no rank drift)
    assert(!GraphRank.pairsAppend(batches(1).toDF("a", "b"), "a", "b", dir, 1))
    assert(fromShards() == incr)
    // TORN SHARD: a writer that died mid-commit left the dir without
    // _SUCCESS — the next append claims and rewrites it
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/pairs/batch=2/_SUCCESS"), false))
    assert(GraphRank.pairsAppend(batches(2).toDF("a", "b"), "a", "b", dir, 2),
      "a torn shard must be claimable")
    assert(fromShards() == incr)
    // a NEW batch of edges shifts the ranks — maintenance is live
    assert(GraphRank.pairsAppend(Seq(8L -> 9L).toDF("a", "b"), "a", "b", dir, 3))
    val grown = fromShards()
    assert(grown.keySet == incr.keySet + 9L)
    assert(grown != incr)
    // the SAME shard union serves connected components (q_cc_incr):
    // shard-derived CC must equal CC over the full pair set
    def cc(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Dedup.connectedComponents(df, "a", "b",
          pairsDistinct = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(spark.read.parquet(s"$dir/pairs")
        .select(col("doc_a").as("a"), col("doc_b").as("b"))) ==
      cc((all ++ Seq(8L -> 9L)).toDF("a", "b")))
  }

  test("rank store: write-once per edge state, serve never iterates, appends and takedowns invalidate") {
    val dir = java.nio.file.Files.createTempDirectory("pr-store").toString
    val all = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L, 1L -> 3L,
                  5L -> 6L, 6L -> 7L, 5L -> 7L, 7L -> 8L, 2L -> 5L)
    all.grouped(4).zipWithIndex.foreach { case (b, i) =>
      assert(GraphRank.pairsAppend(b.toDF("a", "b"), "a", "b", dir, i))
    }
    def read(): Map[Long, Double] = GraphRank.rankStoreRead(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the serve NEVER falls back to the iterative job: no artifact →
    // loud throw naming the refresh as the recovery
    intercept[IllegalArgumentException] { read() }
    assert(GraphRank.refreshRankStore(spark, dir), "first refresh ranks")
    val stored = read()
    val direct = ranks(all)
    assert(stored.keySet == direct.keySet)
    stored.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-12, s"node $k: $v vs ${direct(k)}") }
    // write-once per fingerprint: a replayed refresh is a no-op
    assert(!GraphRank.refreshRankStore(spark, dir))
    // an APPEND changes the edge-state fingerprint: the stale artifact
    // must not serve, and the maintenance refresh catches up
    assert(GraphRank.pairsAppend(Seq(8L -> 9L).toDF("a", "b"), "a", "b", dir, 3))
    intercept[IllegalArgumentException] { read() }
    assert(GraphRank.refreshRankStore(spark, dir))
    assert(read().keySet == direct.keySet + 9L)
    // a TAKEDOWN invalidates too; the refreshed store is the RETAINED
    // ranks (tombstoned node and its edges gone)
    assert(GraphRank.retireAppend(Seq(9L).toDF("id"), "id", dir, 0L))
    intercept[IllegalArgumentException] { read() }
    assert(GraphRank.refreshRankStore(spark, dir))
    val retained = read()
    assert(!retained.contains(9L))
    retained.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-12, s"retained node $k drifted") }
    // crashed refresh: stale staging debris must not block the rerun
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/ranks/_staging"))
    assert(GraphRank.retireAppend(Seq(8L).toDF("id"), "id", dir, 1L))
    assert(GraphRank.refreshRankStore(spark, dir),
      "refresh must heal a crashed predecessor's staging dir")
    assert(!read().contains(8L))
    // exactly one committed artifact survives (superseded fps swept)
    val fps = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/ranks"))
      .filter(_.getPath.getName.startsWith("fp="))
    assert(fps.length == 1, fps.map(_.getPath.getName).mkString(","))
  }
}
