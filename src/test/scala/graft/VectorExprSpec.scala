package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, VectorExpressions => VE}

/** Native codegen'd vector expressions vs the HOF formulations, plus SQL
  * registration and edge cases (zero vectors, length mismatch).
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct/CosineSim agree with HOF aggregate/zip_with on fixtures") {
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val q = emb.where($"vec_id" === 0).select($"embedding".as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.dot($"embedding", $"qv").as("dot_hof"),
      VE.dotProduct($"embedding", $"qv").as("dot_native"),
      Similarity.cosineHof($"embedding", $"qv").as("cos_hof"),
      VE.cosineSim($"embedding", $"qv").as("cos_native"))
    val worst = both.agg(
      max(abs($"dot_hof" - $"dot_native")).as("d"),
      max(abs($"cos_hof" - $"cos_native")).as("c")).head()
    assert(worst.getDouble(0) < 1e-9 && worst.getDouble(1) < 1e-9)
  }

  test("zero vector cosine is 0 (not NaN); length mismatch uses prefix") {
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f)),
      (Seq(1.0f, 1.0f, 5.0f), Seq(1.0f, 1.0f))
    ).toDF("a", "b").select(
      VE.cosineSim($"a", $"b").as("c"),
      VE.dotProduct($"a", $"b").as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(math.abs(rows(1).getDouble(1) - 2.0) < 1e-12)
  }

  test("null array propagates null") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b").select(VE.cosineSim($"a", $"b").as("c"))
    assert(df.head().isNullAt(0))
  }

  test("UnitNorm is BIT-identical to the HOF formulation it replaced") {
    // the r18 replacement for `_nrm` + transform-lambda normalization:
    // same fold order (left-to-right x*x, sqrt, per-element divide,
    // zero-vector passthrough), so every double must match exactly
    val emb = Tables.embeddings(spark, sf0001).limit(200)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
      .unionByName(Seq((9999999L, Seq.fill(4)(0.0)))
        .toDF("vec_id", "v")) // zero vector passes through unscaled
    val hof = emb
      .withColumn("_nrm", sqrt(VE.dotProduct($"v", $"v")))
      .select($"vec_id", transform($"v",
        x => when($"_nrm" === 0, x).otherwise(x / $"_nrm")).as("v"))
    val native = emb.select($"vec_id", VE.unitNorm($"v").as("v"))
    val h = hof.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val n = native.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(h.length == n.length && h.length > 100)
    h.zip(n).foreach { case ((hi, hv), (ni, nv)) =>
      assert(hi == ni)
      assert(hv.length == nv.length)
      hv.zip(nv).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b),
          s"vec $hi: $a != $b")
      }
    }
    // float input widens element-wise like the cast transform
    val f = Tables.embeddings(spark, sf0001).limit(50)
      .select(VE.unitNorm($"embedding").as("v"))
    val f2 = Tables.embeddings(spark, sf0001).limit(50)
      .select(VE.unitNorm(transform($"embedding", _.cast("double"))).as("v"))
    assert(f.collect().map(_.getSeq[Double](0)).toSeq ==
      f2.collect().map(_.getSeq[Double](0)).toSeq)
  }

  test("registered SQL functions work via spark.sql") {
    VE.register(spark)
    Tables.embeddings(spark, sf0001).createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c,
        |       dot_product(a.embedding, b.embedding) AS d
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 0""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) > 0.0)
  }
}
