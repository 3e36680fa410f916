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
    * `big.join(small, key, joinType)` for inner and left-side join types.
    * Right/full outer are rejected: unmatched small-side salt replicas
    * would surface as up-to-`salt` duplicate null-padded rows (salt the
    * other side instead). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti")(normalized),
      s"saltedJoin supports inner/left join types, got '$joinType' — " +
        "replicated small-side rows would duplicate outer results")
    val s = "_salt"
    val bigSalted = big.withColumn(s, (rand(42) * salt).cast("int"))
    val smallSalted = small.withColumn(s, explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, key :+ s, joinType).drop(s)
  }
}
