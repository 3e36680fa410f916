package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r18 A/B: re-measure [[graft.functions.GraphRank.pageRank]]'s
  * checkpoint cadence under the MINIMAL iteration body (the r15 A/B
  * predates the r17 Change-2 shape — verdict item 3). Interleaved
  * min-of-N arms over the real bench input (the minhash pair mine at
  * `$SPARK_GRAFT_SF_DIR`), one arm per `checkpointEvery` value, plus a
  * bit-identity check of the ranks across cadences.
  *
  * `runMain graft.PageRankCadenceProbe [runs]` */
object PageRankCadenceProbe {
  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder())
      .withExtensions(new GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Dedup, GraphRank}

    def pairs = Dedup.minhashPairs(
      Tables.documents(spark, sfDir), "doc_id", "text")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    val arms = Seq(1, 2, 4, 8, 0)
    // warm every arm once (codegen/JIT) before timing
    for (ce <- arms)
      GraphRank.pageRank(pairs, "doc_a", "doc_b", checkpointEvery = ce)
        .write.format("noop").mode("overwrite").save()

    val best = scala.collection.mutable.Map.empty[Int, (Double, Int)]
    for (r <- 1 to runs; ce <- arms) {
      jobs.set(0)
      val t0 = System.nanoTime()
      GraphRank.pageRank(pairs, "doc_a", "doc_b", checkpointEvery = ce)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val j = jobs.get()
      println(f"[cadence] run$r ce=$ce%-2d $sec%6.3f s  $j%3d jobs")
      val cur = best.getOrElse(ce, (Double.MaxValue, 0))
      if (sec < cur._1) best(ce) = (sec, j)
    }
    for (ce <- arms)
      println(f"[cadence] BEST ce=$ce%-2d ${best(ce)._1}%6.3f s  ${best(ce)._2}%3d jobs")

    // bit-identity across cadences (truncation changes where the plan
    // is cut, never arithmetic)
    val ref = GraphRank.pageRank(pairs, "doc_a", "doc_b", checkpointEvery = 1)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    for (ce <- arms.filter(_ != 1)) {
      val got = GraphRank.pageRank(pairs, "doc_a", "doc_b", checkpointEvery = ce)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val same = ref.length == got.length && ref.zip(got).forall {
        case ((n1, r1), (n2, r2)) =>
          n1 == n2 && java.lang.Double.doubleToRawLongBits(r1) ==
            java.lang.Double.doubleToRawLongBits(r2)
      }
      println(s"[cadence] IDENTICAL ce=1 vs ce=$ce: $same")
    }
    spark.stop()
  }
}
