package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and random-hyperplane LSH bucketing
  * as the approximate scale path. Vector math uses higher-order built-ins
  * (`zip_with`/`aggregate`) on double-cast values — no UDFs, no collect.
  *
  * Scale: brute-force against ONE query vector is a broadcast map-side
  * scan + TakeOrdered (no shuffle of the corpus). LSH pre-bucketing makes
  * batch all-pairs search bucket-local, the same pattern as Dedup's
  * banding.
  */
object Similarity {

  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Σ aᵢ·bᵢ via zip_with + aggregate higher-order functions — the
    * portable, built-in-only formulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native fused-loop Catalyst expression
    * ([[VectorExpressions.CosineSim]], codegen'd): one array pass instead
    * of three interpreted HOF walks — the hot path for corpus-scale
    * scoring. The HOF form remains as [[cosineHof]] (equality covered by
    * [[graft.VectorExprSpec]]). */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosineSim(a, b)

  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against the stored vector with id `queryId`.
    * The single query row is broadcast; the corpus is scanned map-side and
    * reduced with TakeOrderedAndProject — no corpus shuffle. */
  def bruteForceTopK(emb: DataFrame, id: String, vec: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(id) === queryId).select(col(vec).as("q_vec"))
    emb.where(col(id) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(id), cosine(col(vec), col("q_vec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(id).asc)
      .limit(k)
  }

  /** Deterministic random hyperplanes: `planes(p)(j)` from a fixed-seed
    * PRNG — stable across runs/executors (driver-computed constants,
    * broadcast as literals). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit LSH bucket id: bit p = (v · plane_p) >= 0. Vectors with the
    * same bucket are cosine-close with high probability. Projections use
    * the codegen'd DotProduct expression — the HOF form made bucketing
    * slower than the brute-force scan it was meant to beat. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val proj = VectorExpressions.dotProduct(vec, array(plane.map(lit): _*))
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k: restrict the scan to the query's LSH bucket (plus
    * all buckets at Hamming distance ≤ 1 for recall), then exact cosine.
    * At scale the bucket column is a partition/cluster key, so the probe
    * touches a small fraction of the corpus. */
  def lshTopK(emb: DataFrame, id: String, vec: String,
              queryId: Long, k: Int, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = emb.withColumn("bucket", lshBucket(col(vec), planes))
    val q = bucketed.where(col(id) === queryId)
      .select(col(vec).as("q_vec"), col("bucket").as("q_bucket"))
    bucketed.where(col(id) =!= queryId)
      .crossJoin(broadcast(q))
      .where(Dedup.hamming(col("bucket"), col("q_bucket")) <= 1)
      .select(col(id), cosine(col(vec), col("q_vec")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(id).asc)
      .limit(k)
  }

  /** Deterministic Lloyd's k-means over the embedding column — the IVF
    * coarse quantizer. Init = first `k` vectors by id (deterministic);
    * each iteration is two shuffles (assign via broadcast centroids →
    * per-dimension mean). Returns (centroid_id, centroid array<double>).
    */
  def kmeansCentroids(emb: DataFrame, id: String, vec: String,
                      k: Int, iters: Int): DataFrame = {
    val v = emb.select(col(id).as("vid"), transform(col(vec), _.cast("double")).as("v"))
    var centroids = v.orderBy("vid").limit(k)
      .select(row_number().over(org.apache.spark.sql.expressions.Window.orderBy("vid"))
        .cast("int").as("cid"), col("v").as("c"))
    for (_ <- 1 to iters) {
      val assigned = assign(v, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p.getField("m")).as("c"))
    }
    centroids.select(col("cid").as("centroid_id"), col("c").as("centroid"))
  }

  /** Nearest-centroid assignment (broadcast centroids, map-side argmax). */
  private def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vid").orderBy(col("sim").desc, col("cid").asc)
    v.crossJoin(broadcast(centroids))
      .select(col("vid"), col("v"), col("cid"), cosine(col("v"), col("c")).as("sim"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .drop("rk", "sim")
  }

  /** IVF approximate top-k: coarse-quantize the corpus into `nlist`
    * centroid lists, probe the `nprobe` lists nearest the query, exact
    * cosine within the probed lists only. At scale the list id is the
    * partition key, so a probe scans ~nprobe/nlist of the corpus. */
  def ivfTopK(emb: DataFrame, id: String, vec: String, queryId: Long,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 3): DataFrame = {
    val v = emb.select(col(id).as("vid"), transform(col(vec), _.cast("double")).as("v"))
    val centroids = kmeansCentroids(emb, id, vec, nlist, iters).cache()
    val lists = assign(v,
      centroids.select(col("centroid_id").as("cid"), col("centroid").as("c"))).cache()
    val q = v.where(col("vid") === queryId).select(col("v").as("qv"))
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("centroid_id"), cosine(col("centroid"), col("qv")).as("sim"))
      .orderBy(col("sim").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select(col("centroid_id").as("cid"))
    lists.join(broadcast(probed), "cid")
      .where(col("vid") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vid").as(id), cosine(col("v"), col("qv")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(id).asc)
      .limit(k)
  }

  /** Batch all-pairs near-neighbor candidates via shared LSH bucket —
    * bucket-local join, never the n² cross product. */
  def bucketPairs(emb: DataFrame, id: String, vec: String,
                  nPlanes: Int = 8, dim: Int = 64, minCos: Double = 0.8): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val b = emb.select(col(id).as("vid"), col(vec).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos_sim"))
      .where(col("cos_sim") >= minCos)
  }
}
