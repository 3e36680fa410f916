package graft

import org.apache.spark.sql.functions._

/** Plan-quality invariants (builder brief: pushdown, codegen, no UDF
  * walls) asserted mechanically so regressions fail loudly, not just in
  * bench numbers.
  */
class PlanQualitySpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("filters reach the parquet scan (PushedFilters)") {
    val p = physical("q_range_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(500))
  }

  test("column pruning: q1_agg reads only the five needed columns") {
    val p = physical("q1_agg")
    assert(p.contains(
      "FileScan parquet [l_quantity#") && !p.contains("l_orderkey"), p.take(800))
  }

  test("normalize layer stays expression-only: no python/scala UDF nodes") {
    Seq("q_normalize_cast", "q_normalize_dates", "q_text_stats").foreach { q =>
      val p = physical(q)
      assert(!p.contains("BatchEvalPython") && !p.contains("ArrowEvalPython"), q)
    }
  }

  test("hot paths run inside WholeStageCodegen") {
    // AQE reports 0 codegen subtrees on a not-yet-executed adaptive
    // plan; disable it for the static inspection, restore after
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq("q1_agg", "q_range_filter", "q_normalize_cast").foreach { q =>
      val s = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
      assert(s.contains("WholeStageCodegen subtrees") &&
        !s.startsWith("Found 0 WholeStageCodegen"), q)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("indicator pipeline shuffles exactly once (single Exchange)") {
    Seq("q_rsi", "q_ema", "q_asof").foreach { q =>
      val n = "Exchange hashpartitioning".r.findAllIn(physical(q)).length
      assert(n == 1, s"$q has $n hash exchanges, expected 1")
    }
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(physical("q_topk").contains("TakeOrderedAndProject"))
    assert(physical("q_api_latest").contains("TakeOrderedAndProject"))
  }
}
