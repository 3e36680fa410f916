package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSim, CosineSimConst, DotProduct, DotProductConst}

/** Optimizer rule (builder brief ladder (c): custom `Rule[LogicalPlan]`
  * via `SparkSessionExtensions`): fold vector expressions whose one side
  * is a plan-time CONSTANT array.
  *
  *  - `CosineSim(x, [c…])` → [[CosineSimConst]]: the constant's norm is
  *    computed once at rewrite time; every ANN scan against a literal
  *    query vector otherwise re-derives `sqrt(Σq²)` per corpus row —
  *    a third of the fused loop.
  *  - `DotProduct(x, [c…])` → [[DotProductConst]]: the literal array is
  *    no longer materialized per row before the loop (LSH bucketing
  *    evaluates `nPlanes` of these per row).
  *
  * Both rewrites are BIT-IDENTICAL to the originals (same accumulation
  * order, same IEEE operation sequence — the DuckDB float-parity oracles
  * pin this), so the rule is safe to install globally via
  * [[graft.GraftExtensions]]. Arrays with null or non-double elements
  * are left alone (the originals' null-element semantics are preserved
  * by not folding).
  */
object FoldConstantVector extends Rule[LogicalPlan] {

  private def constVec(e: Expression): Option[Array[Double]] = e match {
    case CreateArray(children, _) if children.nonEmpty && children.forall {
          case Literal(v, DoubleType) => v != null
          case _ => false
        } =>
      Some(children.map { case Literal(v, _) => v.asInstanceOf[Double] }.toArray)
    case Literal(data: ArrayData, ArrayType(DoubleType, false)) =>
      Some(data.toDoubleArray())
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSim(x, e) if constVec(e).isDefined =>
      val v = constVec(e).get
      CosineSimConst(x, v, CosineSimConst.seqNorm(v))
    case CosineSim(e, x) if constVec(e).isDefined =>
      val v = constVec(e).get
      CosineSimConst(x, v, CosineSimConst.seqNorm(v))
    case DotProduct(x, e) if constVec(e).isDefined =>
      DotProductConst(x, constVec(e).get)
    case DotProduct(e, x) if constVec(e).isDefined =>
      DotProductConst(x, constVec(e).get)
  }
}
