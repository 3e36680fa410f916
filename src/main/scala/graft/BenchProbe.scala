package graft
import org.apache.spark.sql.SparkSession
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val cpus = args.headOption.getOrElse("32")
    val spark = SparkSession.builder()
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
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"PROBE $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"PROBE-warm $q ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
