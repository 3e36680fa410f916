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

  test("count-min estimates are one-sided and the sketch is linear") {
    // skewed stream: 'hot' x500, 'warm' x40, 'cold' x3
    val items = (Seq.fill(500)("hot") ++ Seq.fill(40)("warm") ++
      Seq.fill(3)("cold") ++ (0 until 200).map(i => s"bg$i")).toDF("v")
    val cells = Sketches.cmsCells(items, "v")
    // d*w bounds the counter table regardless of vocabulary size
    assert(cells.count() <= 4L * 1024)
    val est = Sketches.cmsEstimate(cells,
        Seq("hot", "warm", "cold", "never-seen"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS never underestimates; at 743 items over 4x1024 cells the
    // collision surplus is tiny but not assumed zero
    assert(est("hot") >= 500 && est("warm") >= 40 && est("cold") >= 3, est.toString)
    assert(est("never-seen") >= 0)
    // within the epsilon*N bound with big margin (eps = e/w)
    assert(est("hot") <= 500 + 10 && est("cold") <= 3 + 10, est.toString)
    // LINEARITY: shard-wise cells summed == whole-stream cells — the
    // property that makes the sketch maintainable per batch
    val (s1, s2) = (items.limit(300), items.exceptAll(items.limit(300)))
    val summed = Sketches.cmsCells(s1, "v")
      .unionByName(Sketches.cmsCells(s2, "v"))
      .groupBy("r", "c").agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cells
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(summed == whole, "shard-summed sketch diverged from whole-stream build")
  }

  test("heavyHitters is exact even under forced sketch collisions") {
    val items = (Seq.fill(60)("hot1") ++ Seq.fill(55)("hot2") ++
      (0 until 85).map(i => s"light$i")).toDF("v")   // N = 200
    def exact(phi: Double) = items.groupBy("v").count()
      .where(col("count") >= math.ceil(phi * 200).toLong)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w = 4, d = 2: every cell is a pileup — the est prefilter passes
    // almost everything, the exact HAVING still cuts precisely
    val tiny = Sketches.heavyHitters(items, "v", phi = 0.25, d = 2, w = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiny == exact(0.25), s"collided sketch broke exactness: $tiny")
    assert(tiny.keySet == Set("hot1", "hot2"))
    // default sizing at a phi that keeps only one
    val one = Sketches.heavyHitters(items, "v", phi = 0.29)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one == exact(0.29) && one.keySet == Set("hot1"))
  }
}
