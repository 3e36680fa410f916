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

  test("auto-sizing: build-side cardinality rebuilds a saturating filter") {
    // sizedBits math: floor wins for small n, 10 bits/key (rounded to
    // 64) past it, ceiling at AutoMaxBits
    assert(Bloom.sizedBits(100, 1 << 16) == (1 << 16))
    assert(Bloom.sizedBits(30000, 1 << 16) == ((300000 + 63) / 64) * 64)
    assert(Bloom.sizedBits(100000000L, 1 << 16) == Bloom.AutoMaxBits)
    // 30k build keys against the 2^16 default floor used to saturate
    // (~40% fp): the auto-rebuild must restore REAL pruning. Compare the
    // surviving-row count after the probe filter alone (before the exact
    // join) via a manual probe at both sizes.
    val keys = (0L until 30000L).map(_ * 2654435761L + 17)
    val small = new Array[Long]((1 << 16) / 64)
    val sized = new Array[Long](Bloom.sizedBits(30000, 1 << 16) / 64)
    keys.foreach { k => Bloom.setBits(small, k, 3); Bloom.setBits(sized, k, 3) }
    val probes = (1L to 20000L).map(_ * 7919L + 3)
    val fpSmall = probes.count(Bloom.mightContain(small, _, 3))
    val fpSized = probes.count(Bloom.mightContain(sized, _, 3))
    assert(fpSmall > 5000, s"fixture not saturating the small filter: $fpSmall")
    assert(fpSized < 600, s"sized filter still leaking: $fpSized / 20000")
    // end-to-end: the semi-join stays exact with auto-sizing in play
    val fact = spark.range(0, 60000).select(col("id").as("fk"))
    val dim = spark.range(0, 60000, 2).select(col("id").as("dk"))
    val got = Bloom.bloomSemiJoin(fact, dim, "fk", "dk").count()
    assert(got == 30000L)
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
