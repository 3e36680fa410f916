package graft

import org.apache.spark.sql.functions._
import graft.functions.{CosineSimConst, VectorExpressions => VE}

/** FoldConstantVector optimizer rule: fires on literal-vector
  * cosine/dot, leaves column-vs-column forms alone, and the folded
  * expressions are BIT-identical to the originals (the float-parity
  * oracles depend on that).
  */
class ConstVectorRuleSpec extends SparkSpec {
  import spark.implicits._

  // the suite-shared session may predate GraftExtensions (getOrCreate
  // keeps the first session); install the rule explicitly — it is
  // bit-identical by contract, so leaking it to other suites is safe
  if (!spark.experimental.extraOptimizations.contains(graft.plans.FoldConstantVector)) {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.FoldConstantVector
  }

  private def emb = Tables.embeddings(spark, sf0001).limit(50)
    .select($"vec_id", $"embedding")

  private val qv: Array[Double] = Array.tabulate(64)(i => math.sin(i + 1))
  private def qvLit = array(qv.map(lit): _*)

  test("rule rewrites literal-vector cosine/dot to the Const forms") {
    val plan = emb.select(
      VE.cosineSim($"embedding", qvLit).as("c"),
      VE.dotProduct(qvLit, $"embedding").as("d"))
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("cosinesimconst"), plan)
    assert(plan.contains("dotproductconst"), plan)
    // column-vs-column stays the two-sided expression
    val plain = emb.select(VE.cosineSim($"embedding", $"embedding"))
      .queryExecution.optimizedPlan.toString()
    assert(!plain.contains("cosinesimconst"))
  }

  test("folded results are bit-identical to the unfolded expressions") {
    // unfolded reference: compute through the HOF formulation's exact
    // shape by bypassing the rule — evaluate CosineSim/DotProduct rows
    // via the Const implementations' slow path vs a manual Scala loop
    val rows = emb.select($"vec_id",
      VE.cosineSim($"embedding", qvLit).as("c"),
      VE.dotProduct($"embedding", qvLit).as("d"),
      $"embedding").collect()
    rows.foreach { r =>
      val x = r.getSeq[Float](3).map(_.toDouble).toArray
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      val n = math.min(x.length, qv.length)
      var i = 0
      while (i < n) {
        ab += x(i) * qv(i); aa += x(i) * x(i); bb += qv(i) * qv(i); i += 1
      }
      val expC = if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
      assert(r.getDouble(1) == expC, s"cos mismatch vec ${r.getLong(0)}")
      assert(r.getDouble(2) == ab, s"dot mismatch vec ${r.getLong(0)}")
    }
  }

  test("prefix semantics: row shorter than the constant matches CosineSim") {
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v")
    val got = short.select(VE.cosineSim($"v", qvLit).as("c")).head().getDouble(0)
    // manual two-element prefix cosine with qv's PREFIX norm
    val ab = 1.0 * qv(0) + 2.0 * qv(1)
    val aa = 1.0 + 4.0
    val bb = qv(0) * qv(0) + qv(1) * qv(1)
    assert(got == ab / (math.sqrt(aa) * math.sqrt(bb)))
  }

  test("norm folding is the same sequential accumulation") {
    assert(CosineSimConst.seqNorm(qv) ==
      math.sqrt(qv.foldLeft(0.0)((s, v) => s + v * v)))
  }
}
