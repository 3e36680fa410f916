package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder brief: "skewed keys →
  * salting or AQE skew-join"). AQE's skew-join split handles sort-merge
  * skew automatically; explicit salting is the planable alternative when
  * a handful of keys dominate (e.g. one symbol is half the ticks): the
  * big side scatters each key across `salt` sub-keys, the small side is
  * replicated `salt`× — per-task work bounded by hottest-key/salt.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salt` ways. Result equals
    * `big.join(small, key)` for any salt ≥ 1. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val s = "_salt"
    val bigSalted = big.withColumn(s, (rand(42) * salt).cast("int"))
    val smallSalted = small.withColumn(s, explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, key :+ s, joinType).drop(s)
  }
}
