package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom

/** Bloom-filter build/probe and the exact bloom semi-join. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val words = new Array[Long](1024) // 64 Kbit
    val keys = (0L until 5000L).map(_ * 2654435761L + 17)
    keys.foreach(Bloom.setBits(words, _, 3))
    assert(keys.forall(Bloom.mightContain(words, _, 3)))
  }

  test("false-positive rate on disjoint probes stays small") {
    val words = new Array[Long](1024)
    (0L until 1000L).foreach(k => Bloom.setBits(words, k, 3))
    val fps = (1000000L until 1010000L).count(Bloom.mightContain(words, _, 3))
    // m/n = 65.5 bits/key, k=3 -> theoretical fp ~ 1e-4; allow 1%
    assert(fps < 100, s"false positives: $fps / 10000")
  }

  test("distributed build matches the local build regardless of partitioning") {
    val keys = (0L until 2000L).map(_ * 31 + 5)
    val local = new Array[Long](256)
    keys.foreach(Bloom.setBits(local, _, 3))
    for (parts <- Seq(1, 7)) {
      val dist = keys.toDF("k").repartition(parts)
        .select(Bloom.bloomAgg(col("k"), 256 * 64, 3).as("w"))
        .collect()(0).getSeq[Long](0).toArray
      assert(java.util.Arrays.equals(dist, local))
    }
  }

  test("bloomSemiJoin equals the plain semi-join and prunes map-side") {
    // spark.range (not a local Seq): a LocalRelation input would let
    // ConvertToLocalRelation evaluate the probe filter driver-side and
    // erase it from the plan under test
    val fact = spark.range(0, 3000).select(col("id").as("fk"), (col("id") % 97).as("v"))
    val dim = (0L until 3000L by 50).map(j => (j, "x")).toDF("dk", "tag")
    val exact = fact.join(dim, col("fk") === col("dk"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    val got = Bloom.bloomSemiJoin(fact, dim, "fk", "dk")
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == exact.toSeq)
    // the probe filter is a map-side predicate in the plan, below the join
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("bloomcontainslong") || plan.contains("BloomContainsLong"),
      s"expected BloomContainsLong filter in plan:\n$plan")
  }

  test("null fact keys never pass the probe filter (SQL join semantics)") {
    val fact = Seq(Some(1L), None, Some(2L)).toDF("fk")
    val dim = Seq(1L).toDF("dk")
    val got = Bloom.bloomSemiJoin(fact, dim, "fk", "dk")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("registry q_bloom_semi matches the built-in semi-join on the fixture") {
    val d = sf0001
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.get(1).asInstanceOf[Number].longValue)
    val expected = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d).where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .collect().map(key).sorted.toSeq
    val got = queries.Relational.joinBloomSemi(spark, d)
      .collect().map(key).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }
}
