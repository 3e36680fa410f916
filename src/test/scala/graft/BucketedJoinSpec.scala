package graft

import org.apache.spark.sql.functions._

/** Co-located bucketed join (builder brief: "bucketing for co-located
  * joins"): two tables bucketed 8-ways on the join key join WITHOUT a
  * shuffle — the physical plan has no Exchange. This is the 100 TB
  * fact-to-fact join strategy when both sides are lake tables written
  * once and joined often.
  */
class BucketedJoinSpec extends SparkSpec {

  test("joining two bucketed tables plans no shuffle Exchange") {
    // isolate from the shared JVM session: getOrCreate on the existing
    // default would MUTATE its runtime conf (broadcast threshold) for
    // every later suite; clear, build fresh, restore in finally
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    var s: org.apache.spark.sql.SparkSession = null
    try {
      // clear/build INSIDE the try: a builder failure must still restore
      // the shared default session in finally
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      s = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .appName("bucketed")
        .getOrCreate()
      Tables.orders(s, sf0001)
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(s, sf0001)
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = s.table("lineitem_b")
        .join(s.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("q"))
      val physical = joined.queryExecution.executedPlan.toString
      // the join itself must be shuffle-free; only the final groupBy
      // repartitions. SortMergeJoin reads both sides bucket-aligned.
      val joinSection = physical.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles:\n$physical")
      // result correctness vs unbucketed join
      val expect = Tables.lineitem(s, sf0001)
        .join(Tables.orders(s, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect)

      // the FLAGSHIP query over the same bucketed tables: fact-fact SMJ
      // with zero Exchange below the final groupBy, dims broadcast
      val flagship = queries.Relational.joinRevenuePerNationBucketed(s, sf0001)
      val fPlan = flagship.queryExecution.executedPlan.toString
      val fJoin = fPlan.split("SortMergeJoin")(1)
      assert(!fJoin.contains("Exchange hashpartitioning(l_orderkey") &&
        !fJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed flagship join still shuffles the facts:\n$fPlan")
      assert(fPlan.contains("BroadcastHashJoin"), s"dims not broadcast:\n$fPlan")
      val fGot = flagship.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      val fExpect = queries.Relational.joinRevenuePerNation(s, sf0001).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      // FP tolerance: the two plans merge partial double sums in
      // different orders (bucketed vs scan-split partials)
      assert(fGot.keySet == fExpect.keySet)
      fGot.foreach { case (k, (rev, n)) =>
        assert(n == fExpect(k)._2)
        assert(math.abs(rev - fExpect(k)._1) <= 1e-6 * math.max(1.0, math.abs(rev)),
          s"$k revenue $rev vs ${fExpect(k)._1}")
      }
    } finally {
      if (s != null) {
        s.sql("DROP TABLE IF EXISTS orders_b")
        s.sql("DROP TABLE IF EXISTS lineitem_b")
      }
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("a list-bucketed codes table elides its side of the shuffled ANN-join exchange") {
    // the listJoin scale claim, proven mechanically: past the broadcast
    // gate both sides hash-partition on `list` — but when the stored
    // codes table is WRITTEN bucketed by list (the production layout for
    // index-once/probe-many), its exchange is elided entirely and only
    // the routed query side shuffles. Same session-isolation discipline
    // as the bucketed-tables test above.
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    var s: org.apache.spark.sql.SparkSession = null
    try {
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      s = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .appName("bucketed-ann")
        .getOrCreate()
      val ss = s
      import ss.implicits._
      val rnd = new scala.util.Random(7)
      val emb = (0L until 500L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
        .toDF("vid", "v")
      // a deterministic list assignment stands in for NearestCentroid:
      // the exchange mechanics under test depend only on the layout
      val assigned = emb.withColumn("list", pmod(hash(col("vid")), lit(16)))
      assigned.write.mode("overwrite").bucketBy(8, "list").saveAsTable("codes_b")
      val routed = emb.where(col("vid") < 50)
        .select(col("vid").as("qid"), col("v").as("qv"))
        .withColumn("list", explode(array(
          pmod(hash(col("qid")), lit(16)), pmod(hash(col("qid") + 1), lit(16)))))
      def nListExchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning\\(list".r
          .findAllIn(df.queryExecution.executedPlan.toString).length
      val bucketed = s.table("codes_b").join(routed.hint("merge"), Seq("list"))
      assert(bucketed.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      assert(nListExchanges(bucketed) == 1,
        s"bucketed codes side must not shuffle:\n${bucketed.queryExecution.executedPlan}")
      // the same join against the unbucketed frame shuffles BOTH sides
      val flat = assigned.join(routed.hint("merge"), Seq("list"))
      assert(nListExchanges(flat) == 2,
        s"control: expected both sides to shuffle:\n${flat.queryExecution.executedPlan}")
      // identical join output either way
      assert(bucketed.count() == flat.count() && bucketed.count() > 0)
    } finally {
      if (s != null) s.sql("DROP TABLE IF EXISTS codes_b")
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  test("IVF top-k recalls planted near neighbors and matches brute force head") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 32
    val q = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def noisy() = q.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    val rows =
      (0L, q.toSeq) +:
      (1L to 5L).map(i => (i, noisy().toSeq)) ++:
      (6L until 306L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val ivf = graft.functions.Similarity
      .ivfTopK(emb, "vec_id", "embedding", 0L, 5, nlist = 8, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    assert((1L to 5L).toSet.intersect(ivf).size >= 4,
      s"IVF missed planted neighbors: $ivf")
  }

  test("seeded IVF (zero iterations) recalls planted near neighbors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val q = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def noisy() = q.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    // planted near-dups get HIGH ids: seeds are the first nlist ids, and
    // a near-dup that is itself a seed anchors its own list instead of
    // quantizing to the query's list
    val rows =
      (0L, q.toSeq) +:
      (1L until 301L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)) ++:
      (301L to 305L).map(i => (i, noisy().toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val got = graft.functions.Similarity
      .ivfSeededTopK(emb, "vec_id", "embedding", 0L, 5, nlist = 8, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    // the noisy near-dups quantize to the query-seed list (seed 0 IS the
    // query vector), which is always among the probed lists
    assert((301L to 305L).toSet.intersect(got).size >= 4,
      s"seeded IVF missed planted neighbors: $got")
  }

  test("IVF survives dropped empty clusters (duplicate seed vectors)") {
    import spark.implicits._
    // init = first k vectors by id; vec 1 duplicates vec 0, so every
    // point ties to the LOWER centroid and the duplicate's cluster
    // empties on iteration 1 — probe ids must stay consistent with the
    // shrunken centroid array (positions, not stored ids)
    val a = Seq(1.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f)
    val c = Seq(0.0f, 0.0f, 1.0f)
    def near(v: Seq[Float], eps: Float) = v.map(_ + eps)
    val emb = (Seq(
      (0L, a), (1L, a), (2L, b), (3L, c)) ++
      (4L to 9L).map(i => (i, near(a, 0.01f * i))) ++
      (10L to 15L).map(i => (i, near(b, 0.002f * i))) ++
      (16L to 21L).map(i => (i, near(c, 0.002f * i)))
    ).toDF("vec_id", "embedding")
    val got = graft.functions.Similarity
      .ivfTopK(emb, "vec_id", "embedding", 0L, 4, nlist = 3, nprobe = 1, iters = 2)
      .collect().map(_.getLong(0)).toSet
    // nprobe=1 must hit the a-cluster: the nearest neighbors of `a` are
    // the duplicate and the near-a points, never the b/c clusters
    assert(got.contains(1L), s"duplicate of the query's own vector missing: $got")
    assert(got.forall(i => i == 1L || (4L to 9L).contains(i)),
      s"probe leaked into the wrong centroid list: $got")
  }
}
