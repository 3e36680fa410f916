package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions installs the native vector functions through the
  * standard spark.sql.extensions mechanism. The suite runs in a shared
  * JVM: clear the default/active session so getOrCreate builds a fresh
  * session WITH extensions (over the shared SparkContext), and restore
  * afterwards instead of stopping (stop would kill the JVM-wide
  * context for later suites).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions provides SQL functions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // spark.sql.extensions is a STATIC conf: honored only when the
      // SparkContext itself is created (spark-submit); in a shared-JVM
      // suite the context pre-exists, so use the programmatic form —
      // same extension class, same injection path.
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("ext")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s.sql(
        """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       md5_long60('alpha') AS h,
          |       array_eq_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS eq""".stripMargin)
        .head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 11.0) < 1e-12)
      assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 60))
      assert(r.getInt(3) == 2)
      // the optimizer rule is installed too (plan-shape coverage lives
      // in ConstVectorRuleSpec; over VALUES/literals everything
      // constant-folds away before the assertion could see it)
      assert(s.sessionState.optimizer.extendedOperatorOptimizationRules
        .contains(graft.plans.FoldConstantVector))
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
