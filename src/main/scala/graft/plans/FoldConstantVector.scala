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

  /** Extractor for a non-empty plan-time-constant double vector (both
    * the CreateArray-of-literals and the constant-folded array-Literal
    * forms). Empty arrays are NOT matched — the Const expressions
    * require non-empty vectors, and the originals' empty-input semantics
    * (score 0.0) should be left untouched. */
  private object ConstVec {
    def unapply(e: Expression): Option[Array[Double]] = e match {
      case CreateArray(children, _) if children.nonEmpty && children.forall {
            case Literal(v, DoubleType) => v != null
            case _ => false
          } =>
        Some(children.map { case Literal(v, _) => v.asInstanceOf[Double] }.toArray)
      case Literal(data: ArrayData, ArrayType(DoubleType, false))
          if data != null && data.numElements() > 0 =>
        Some(data.toDoubleArray())
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSim(x, ConstVec(v)) => CosineSimConst(x, v, CosineSimConst.seqNorm(v))
    case CosineSim(ConstVec(v), x) => CosineSimConst(x, v, CosineSimConst.seqNorm(v))
    case DotProduct(x, ConstVec(v)) => DotProductConst(x, v)
    case DotProduct(ConstVec(v), x) => DotProductConst(x, v)
  }
}
