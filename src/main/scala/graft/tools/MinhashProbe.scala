package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Dedup

/** Stage-by-stage timing of the minhashPairs pipeline — scratch probe for
  * finding the dominant cost (not part of the driver contract).
  * Usage: runMain graft.tools.MinhashProbe /root/testdata/sf0.1
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("minhash-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }

    val docs = Tables.documents(spark, dir).cache()
    docs.count()

    val sh = Dedup.shinglesRaw(docs, "doc_id", "text", 5).cache()
    time("shinglesRaw.count") { sh.count() }
    time("shingles re-count (cached)") { sh.count() }
    time("md5Hash60 agg") {
      sh.select((Dedup.md5Hash60(col("shingle")) % Dedup.P).as("h"))
        .agg(bit_xor(col("h"))).collect(); 1L
    }
    time("md5 only agg") {
      sh.select(md5(col("shingle")).as("h")).agg(max("h")).collect(); 1L
    }
    time("conv only agg") {
      sh.select(conv(substring(lit("abcdef0123456"), 1, 13), 16, 10).cast("long").as("h"))
        .agg(bit_xor(col("h"))).collect(); 1L
    }
    time("xxhash64 baseline") {
      sh.select(xxhash64(col("shingle")).as("h")).agg(bit_xor(col("h"))).collect(); 1L
    }
    time("signatures.count") {
      Dedup.minhashSignatures(sh, 64).count()
    }
    time("signatures re-count") {
      Dedup.minhashSignatures(sh, 64).count()
    }
    time("pairs full") {
      Dedup.minhashPairs(docs, "doc_id", "text").count()
    }
    // cold replay of the exact minhashPairs sequence, step by step
    spark.catalog.clearCache()
    val docs2 = Tables.documents(spark, dir)
    val sigsCold = Dedup.minhashSignatures(
      Dedup.shinglesRaw(docs2, "doc_id", "text", 5), 64).cache()
    time("cold sigs.count") { sigsCold.count() }
    val rows0 = 64 / 16
    val bandedCold = sigsCold.select(col("doc_id"), posexplode(
      array((0 until 16).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows0 + 1, rows0))): _*))
      .as(Seq("band", "band_hash")))
    time("cold banded.count") { bandedCold.count() }
    val candCold = bandedCold.as("a").join(bandedCold.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cold candidates.count") { candCold.count() }
    val estCold = candCold
      .join(sigsCold.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigsCold.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / 64).as("est_jaccard"))
      .where(col("est_jaccard") >= 0.5)
    time("cold est.count") { estCold.count() }
    spark.catalog.clearCache()
    time("pairs full cold2") {
      Dedup.minhashPairs(Tables.documents(spark, dir), "doc_id", "text").count()
    }
    // warm-path sub-stages (everything cached)
    val sigs = Dedup.minhashSignatures(sh, 64).cache()
    sigs.count()
    val rows = 64 / 16
    val banded = sigs.select(col("doc_id"), posexplode(
      array((0 until 16).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))): _*))
      .as(Seq("band", "band_hash")))
    time("banded.count") { banded.count() }
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("candidates.count") { cand.count() }
    val est = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / 64).as("est_jaccard"))
      .where(col("est_jaccard") >= 0.5)
    time("est.count (cached sigs)") { est.count() }
    Dedup.minhashSignatures(sh, 64)
      .queryExecution.executedPlan.toString().linesIterator.take(30)
      .foreach(l => println("[plan] " + l))
    spark.stop()
  }
}
