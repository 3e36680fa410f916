package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time individual registry queries cold + warm with the
  * SAME full-materialization action as [[Bench]].
  *
  * Usage: `runMain graft.BenchProbe [--cpus=N] q_name [q_name...]`
  * SF dir comes from SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * matching Bench.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val (flags, queries) = args.partition(_.startsWith("--"))
    val cpus = flags.collectFirst { case f if f.startsWith("--cpus=") => f.stripPrefix("--cpus=") }
      .getOrElse("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    if (queries.isEmpty || unknown.nonEmpty) {
      // nonzero in BOTH misuse cases: a caller that probes nothing must
      // not look like a successful run to the invoking script
      System.err.println(
        s"usage: BenchProbe [--cpus=N] q_name...  (unknown: ${unknown.mkString(",")})")
      sys.exit(1)
    }
    val spark = SessionTuning.tuned(SparkSession.builder())
      .withExtensions(new GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (q <- queries) {
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(q)(spark, sfDir))
      println(f"PROBE $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(q)(spark, sfDir))
      println(f"PROBE-warm $q ${(System.nanoTime() - t1) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
