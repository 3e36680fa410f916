package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayEqCount, CosineSim, DotProduct, Md5Long60}

/** Standard Spark extension entry point (builder brief ladder (c):
  * registration via `SparkSessionExtensions`): installs the native
  * vector functions into every session built with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * so `SELECT cosine_sim(a, b)` works in plain SQL with the codegen'd
  * fused-loop expressions — no per-session registration call needed —
  * and installs the [[graft.plans.FoldConstantVector]] optimizer rule
  * (constant-query-vector norm folding for ANN scans).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
    e.injectFunction((
      FunctionIdentifier("md5_long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5_long60"),
      (args: Seq[Expression]) => Md5Long60(args.head)))
    e.injectFunction((
      FunctionIdentifier("array_eq_count"),
      new ExpressionInfo(classOf[ArrayEqCount].getName, "array_eq_count"),
      (args: Seq[Expression]) => ArrayEqCount(args.head, args(1))))
    e.injectOptimizerRule(_ => graft.plans.FoldConstantVector)
  }
}
