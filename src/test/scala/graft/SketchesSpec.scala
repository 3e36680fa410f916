package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Sketches}

/** KMV distinct-count sketch: exactness below k, accuracy above it, and
  * the determinism (partition-independence) that earns it an oracle. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def kept(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(Sketches.kMinValues(Dedup.md5Hash60(col("v")), k).as("kept"),
        Sketches.kmvEstimate(col("kept"), k).as("est"))

  test("below k distinct values the estimate is the exact count") {
    val df = (0 until 100).map(i => s"tok${i % 40}").toDF("v") // 40 distinct
    val r = kept(df, 256).head()
    assert(r.getAs[scala.collection.Seq[Long]]("kept").size == 40)
    assert(r.getAs[Double]("est") == 40.0)
  }

  // the fixture's token vocabulary (~31) is below any useful k; its
  // ~25k distinct 5-gram shingles are the estimator-branch workload
  private def shingles = Dedup.shinglesRaw(
      Tables.documents(spark, sf0001), "doc_id", "text", 5)
    .select(col("shingle").as("v"))

  test("estimate lands within ~1/sqrt(k) of exact distinct at fixture scale") {
    val exact = shingles.distinct().count().toDouble
    val est = kept(shingles, 256).head().getAs[Double]("est")
    assert(exact > 256, s"fixture shingle universe too small ($exact) for the sketch branch")
    assert(math.abs(est - exact) / exact < 0.2,
      s"KMV est $est vs exact $exact: off by ${math.abs(est - exact) / exact}")
  }

  test("the k-min set is partition-independent (deterministic merges)") {
    val one = kept(shingles.coalesce(1), 64).head().getAs[scala.collection.Seq[Long]]("kept")
    val many = kept(shingles.repartition(16), 64).head().getAs[scala.collection.Seq[Long]]("kept")
    assert(one == many && one.size == 64 && one == one.sorted)
  }

  test("kmvMerge of shard sketches equals sketching the union directly") {
    val evens = shingles.where(expr("abs(hash(v)) % 2 = 0"))
    val odds = shingles.where(expr("abs(hash(v)) % 2 = 1"))
    def sketch(df: org.apache.spark.sql.DataFrame, name: String) =
      df.select(Sketches.kMinValues(Dedup.md5Hash60(col("v")), 64).as(name))
        .withColumn("_j", lit(1))
    val merged = sketch(evens, "a").join(sketch(odds, "b"), "_j")
      .select(Sketches.kmvMerge(col("a"), col("b"), 64).as("kept"))
      .head().getAs[scala.collection.Seq[Long]]("kept")
    val direct = sketch(shingles, "kept").select("kept")
      .head().getAs[scala.collection.Seq[Long]]("kept")
    assert(merged == direct && merged.size == 64)
    // a missing shard (outer-join NULL) is the empty set, not a sketch
    // killer: merge(x, NULL) == x
    val withNull = sketch(shingles, "kept")
      .select(col("kept"),
        Sketches.kmvMerge(col("kept"), lit(null).cast("array<long>"), 64).as("m"))
      .head()
    assert(withNull.getAs[scala.collection.Seq[Long]]("m") ==
      withNull.getAs[scala.collection.Seq[Long]]("kept"))
  }

  test("kmvIntersectEstimate recovers a planted overlap") {
    // shards of 30k and 25k values sharing exactly 15k: ids as strings
    // through the same md5 path the corpus operators use
    val a = spark.range(0, 30000).selectExpr("cast(id as string) as v")
    val b = spark.range(15000, 40000).selectExpr("cast(id as string) as v")
    def sk(df: org.apache.spark.sql.DataFrame, name: String) =
      df.select(Sketches.kMinValues(Dedup.md5Hash60(col("v")), 1024).as(name))
    // 1x1 crossJoin is fine in a spec; registry queries avoid it for
    // the plan-quality gate
    val est = sk(a, "ka").crossJoin(sk(b, "kb"))
      .select(Sketches.kmvIntersectEstimate(col("ka"), col("kb"), 1024).as("i"))
      .head().getAs[Double]("i")
    assert(math.abs(est - 15000.0) / 15000.0 < 0.25,
      s"intersection est $est vs true 15000")
  }

  test("duplicate and null inputs never distort the k-set") {
    val df = (Seq.fill(50)("same") ++ Seq("a", "b", null)).toDF("v")
    val r = kept(df, 8).head()
    // md5 of a null string is null -> skipped; 3 distinct non-null values
    assert(r.getAs[scala.collection.Seq[Long]]("kept").size == 3 && r.getAs[Double]("est") == 3.0)
  }
}
