package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.functions.{Dedup, Similarity}

/** Empty-corpus robustness: every dedup/similarity operator must return
  * an empty result (or fail with a descriptive require) on zero rows —
  * never NPE or a degenerate plan. Empty partitions are an everyday
  * occurrence at scale (partition pruning, dead shards).
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs: DataFrame = spark.createDataFrame(
    java.util.List.of[org.apache.spark.sql.Row](),
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  private def emptyEmb: DataFrame = spark.createDataFrame(
    java.util.List.of[org.apache.spark.sql.Row](),
    StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.exactGroups(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.dedupKeepRows(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.jaccardPairs(emptyDocs, "doc_id", "text", 3).count() === 0)
    assert(Dedup.minhashPairs(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.minhashPairsJoin(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.dedupGroups(emptyDocs, "doc_id", "text").count() === 0)
  }

  test("two-corpus decontamination handles empty train/bench sides") {
    import spark.implicits._
    import graft.queries.CurationQueries
    val some = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // empty train: nothing to flag; empty bench: nothing contaminates
    assert(CurationQueries.decontaminateAgainst(emptyDocs, some).count() === 0)
    assert(CurationQueries.decontaminateAgainst(some, emptyDocs).count() === 0)
    assert(CurationQueries.decontaminateAgainst(emptyDocs, emptyDocs).count() === 0)
  }

  test("stored decontamination handles empty bench artifacts and empty corpora") {
    import spark.implicits._
    import graft.queries.CurationQueries
    val some = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // an EMPTY bench set still writes a schema-bearing artifact, and
    // probing it flags nothing; an empty corpus against a real
    // artifact returns empty
    val dir = java.nio.file.Files.createTempDirectory("decon-empty").toString
    CurationQueries.benchShingleArtifacts(emptyDocs, s"$dir/e")
    assert(CurationQueries.decontaminateFromDir(some, s"$dir/e").count() === 0)
    CurationQueries.benchShingleArtifacts(some, s"$dir/f")
    assert(CurationQueries.decontaminateFromDir(emptyDocs, s"$dir/f").count() === 0)
    // self-contamination detected through the stored path
    assert(CurationQueries.decontaminateFromDir(some, s"$dir/f").count() === 1)
  }

  test("a drop list covering every shingle empties the pair pipelines") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val all = Dedup.shingles(docs, "doc_id", "text", 5)
      .select("shingle").distinct()
    assert(Dedup.minhashPairs(docs, "doc_id", "text",
      dropShingles = Some(all)).count() === 0)
    assert(Dedup.jaccardPairs(docs, "doc_id", "text", 5,
      dropShingles = Some(all)).count() === 0)
    spark.catalog.clearCache() // jaccardPairs' documented cache contract
    // and an EMPTY drop list is a no-op, not a filter-everything
    assert(Dedup.minhashPairs(docs, "doc_id", "text",
      dropShingles = Some(emptyDocs.select(col("text").as("shingle")))).count() === 1)
  }

  test("KMV sketch on an empty corpus yields the empty k-set, estimate 0") {
    import org.apache.spark.sql.functions.col
    val r = emptyDocs
      .select(graft.functions.Sketches.kMinValues(
        Dedup.md5Hash60(col("text")), 8).as("kept"),
        graft.functions.Sketches.kmvEstimate(col("kept"), 8).as("est"))
      .head() // global agg over zero rows still emits one row
    assert(r.getAs[scala.collection.Seq[Long]]("kept").isEmpty)
    assert(r.getAs[Double]("est") == 0.0)
  }

  test("similarity scans return empty on an empty corpus") {
    assert(Similarity.bruteForceTopK(emptyEmb, "vec_id", "embedding", 0L, 5).count() === 0)
    assert(Similarity.lshTopK(emptyEmb, "vec_id", "embedding", 0L, 5).count() === 0)
    assert(Similarity.bucketPairs(emptyEmb, "vec_id", "embedding").count() === 0)
  }

  test("curation layer returns empty on an empty corpus") {
    import graft.queries.{CurationQueries, PipelineQueries}
    assert(CurationQueries.chunksOf(emptyDocs).count() === 0)
    assert(CurationQueries.decontaminateOf(emptyDocs).count() === 0)
    assert(CurationQueries.dedupCapOf(emptyDocs).count() === 0)
    assert(CurationQueries.tokenBudgetOf(emptyDocs).count() === 0)
    assert(PipelineQueries.boilerplateOf(emptyDocs, 3, 10).count() === 0)
    assert(PipelineQueries.dedupBestOf(emptyDocs).count() === 0)
    // window-based curation over zero rows (needs the lang/source cols)
    val emptyFull = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType),
        StructField("source", StringType))))
    assert(graft.queries.CurationQueries.qualityTopPOf(emptyFull).count() === 0)
    assert(graft.queries.CurationQueries.mixPlanOf(emptyFull).count() === 0)
    // seeded quantizers (semDedup, ivfSeededTopK) REQUIRE a non-empty
    // corpus — descriptive failure, not an NPE or silent empty
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedup(emptyEmb, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("non-empty corpus"))
    // bloom build over zero keys: empty bits, probe rejects everything,
    // semi-join result empty
    val emptyKeys = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("k", LongType))))
    assert(graft.functions.Bloom.bloomSemiJoin(
      spark.range(5).toDF("k"), emptyKeys, "k", "k").count() === 0)
  }

  test("IVF fails fast with a descriptive message on an empty corpus") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emptyEmb, "vec_id", "embedding", 0L, 5)
    }
    assert(ex.getMessage.contains("non-empty"))
  }

  test("r10 additions return empty (or pass through) on empty corpora") {
    import graft.queries.{CurationQueries, PipelineQueries}
    assert(Dedup.lineDedup(emptyDocs, "doc_id", "text", minDocs = 2).count() === 0)
    assert(CurationQueries.packSequencesOf(emptyDocs).count() === 0)
    assert(PipelineQueries.postingsIndexOf(emptyDocs).count() === 0)
    // merging an empty delta (or into an empty store) passes the other
    // side through unchanged — the first-ever-batch and quiet-day shapes
    import spark.implicits._
    val some = PipelineQueries.postingsIndexOf(
      Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text"), cap = 4)
    val empty = PipelineQueries.postingsIndexOf(emptyDocs, cap = 4)
    def rows(df: DataFrame) = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getSeq[Long](2).toList)).toSet
    assert(rows(PipelineQueries.mergePostings(some, empty, cap = 4)) == rows(some))
    assert(rows(PipelineQueries.mergePostings(empty, some, cap = 4)) == rows(some))
    assert(PipelineQueries.mergePostings(empty, empty, cap = 4).count() === 0)
  }

  test("r11 additions return empty on empty corpora") {
    import graft.queries.CurationQueries
    import graft.functions.{Multimodal, TextAnalysis}
    assert(CurationQueries.packRowsOf(emptyDocs).count() === 0)
    assert(TextAnalysis.tfPostings(emptyDocs, "doc_id", "text").count() === 0)
    assert(TextAnalysis.docLengths(emptyDocs, "doc_id", "text").count() === 0)
    // BM25 served from an EMPTY index: no query-term rows, no scored
    // docs — the scalar agg's one zero-count row must not fabricate any
    assert(TextAnalysis.bm25FromIndex(
      TextAnalysis.tfPostings(emptyDocs, "doc_id", "text"),
      TextAnalysis.docLengths(emptyDocs, "doc_id", "text"),
      Seq("join")).count() === 0)
    val emptyMedia = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](), Multimodal.mediaSchema)
    assert(Multimodal.frameStats(emptyMedia).count() === 0)
  }

  test("r12 additions return empty (or fail fast) on empty corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import graft.functions.{Sketches, TextAnalysis}
    val some = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // semantic decontamination: empty train → nothing flagged; empty
    // bench → nothing contaminates (contract schema kept)
    assert(Similarity.decontaminateSem(
      emptyEmb, some, "vec_id", "embedding", 0.5).count() === 0)
    assert(Similarity.decontaminateSem(
      some, emptyEmb, "vec_id", "embedding", 0.5).count() === 0)
    // quota sampling / outliers need seeds — empty corpus fails FAST
    // with the seeded-quantizer message, never an NPE
    val e1 = intercept[IllegalArgumentException](
      Similarity.clusterSample(emptyEmb, "vec_id", "embedding", 10))
    assert(e1.getMessage.contains("non-empty"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.embedOutliers(emptyEmb, "vec_id", "embedding", 0.5))
    assert(e2.getMessage.contains("non-empty"))
    // corpus statistics: empty in, empty out
    assert(TextAnalysis.sourceKl(
      emptyDocs.withColumn("source", lit("s")), "doc_id", "text",
      "source").count() === 0)
    val emptyV = emptyDocs.select(col("doc_id").cast("string").as("v"))
    assert(Sketches.cmsCells(emptyV, "v").count() === 0)
    assert(Sketches.cmsEstimate(Sketches.cmsCells(emptyV, "v"),
      Seq("x")).collect().map(r => r.getLong(1)).forall(_ == 0L))
    assert(Sketches.heavyHitters(emptyV, "v", 0.1).count() === 0)
    // hygiene projections pass empty through
    assert(emptyDocs.select(
      graft.functions.NfcNormalize(col("text"))).count() === 0)
  }

  test("r13 additions return empty (or fail fast) on empty corpora") {
    import spark.implicits._
    import graft.functions.{GraphRank, TextAnalysis}
    import graft.streaming.PostingsIndex
    // SQ8: an empty corpus has no query vector — the same descriptive
    // failure as every collectQueryVector consumer
    val eq = intercept[IllegalArgumentException](
      Similarity.sqTopK(emptyEmb, "vec_id", "embedding", 0L, 5))
    assert(eq.getMessage.contains("not found"))
    // an empty pair-shard accumulation: appends claim fine, rank over
    // zero edges fails fast at the |V| count (pageRank requires a
    // non-empty vertex set to seed ranks)
    val dir = java.nio.file.Files.createTempDirectory("empty-pairs").toString
    val emptyPairs = spark.createDataFrame(
      java.util.List.of[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    assert(GraphRank.pairsAppend(emptyPairs, "a", "b", dir, 0L))
    assert(GraphRank.pageRankFromPairs(spark, dir).count() === 0)
    // CC over the empty shard union: no pairs, no components
    assert(graft.functions.Dedup.connectedComponents(
      GraphRank.readPairShards(spark, dir), "doc_a", "doc_b",
      pairsDistinct = true).count() === 0)
    // NB: training on an empty corpus has no classes — the model grid
    // is empty and classification returns no rows (never an NPE)
    val emptyLabeled = emptyDocs.withColumn("lang",
      org.apache.spark.sql.functions.lit("en")).where("1=0")
    val m = TextAnalysis.nbModel(emptyLabeled, "doc_id", "text", "lang")
    assert(m.count() === 0)
    assert(TextAnalysis.nbClassify(emptyDocs, "doc_id", "text", m).count() === 0)
    // unigram count shards over an empty batch: claimable, zero rows,
    // and scoring an empty corpus from them returns empty
    val udir = java.nio.file.Files.createTempDirectory("empty-uni").toString
    assert(TextAnalysis.unigramCountsAppend(emptyDocs, "doc_id", "text", udir, 0L))
    assert(TextAnalysis.unigramXentFromCounts(
      emptyDocs, "doc_id", "text", udir).count() === 0)
    // WAND: a query whose terms have no sidecar rows takes the exact
    // empty short-circuit — zero tf-scan jobs, empty result (the
    // one-doc layout is the smallest real layout; an all-empty-corpus
    // LAYOUT cannot be derived because readTfIndex has nothing to
    // infer from, the documented empty-index boundary)
    val wdir = java.nio.file.Files.createTempDirectory("empty-wand").toString
    val (tfP, dlP) = (s"$wdir/tf", s"$wdir/dl")
    PostingsIndex.tfIndexBatch(
      Seq((1L, "solitary token")).toDF("doc_id", "text"), 0, tfP, dlP)
    PostingsIndex.wandLayoutFrom(spark, tfP, s"$wdir/wand", span = 8L)
    assert(PostingsIndex.searchBm25Wand(spark, s"$wdir/wand", dlP,
      Seq("never-indexed"), 5).count() === 0)
  }
}
