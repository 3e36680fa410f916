package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, Dedup, ShardWrite, Similarity, TextAnalysis => TA}
import graft.queries.{CurationQueries, PipelineQueries}

/** ONE-COMMAND CURATION RUN (r15 verdict item 4; cross-modal per r16
  * item 2) — the production composition the registry rows exercise
  * piecewise, shipped as a RESUMABLE driver main: raw documents →
  * bench holdout → exact dedup → near-dup components → SEMANTIC dedup
  * (embedding components) → benchmark decontamination (shingles) →
  * SEMANTIC decontamination (embedding cosine vs the same held-out
  * population) → cluster-balanced sampling → quality floor → tokenizer
  * training → mixture downsampling → context-window packing → shard
  * manifest + drop report. The mixture shares and the pack windows are
  * DENOMINATED in the run's own trained tokenizer tokens
  * ([[graft.functions.Bpe.docTokenCountExpr]] under the `tokenizer`
  * stage's merges), not whitespace words.
  *
  * Cross-modal contract: the text and embedding tables share ids (the
  * fixtures' doc_id ≡ vec_id), and ONE md5-bucket holdout population
  * covers both modalities — the `bench` stage's doc ids select the
  * bench EMBEDDINGS for semantic decontamination too (the
  * `q_drop_reasons_sem` convention). Only (id) drop-key sets ever
  * cross the modality boundary — anti-join keys, never vectors. A doc
  * without an embedding row passes the embedding gates untouched (it
  * cannot be judged semantically), exactly like the registry
  * compositions.
  *
  * Resume contract — the claim discipline the maintained channels
  * already use ([[graft.functions.ShardWrite.claim]]): every stage
  * writes `outDir/<stage>` exactly once; a COMPLETE stage (directory +
  * `_SUCCESS`) is skipped on rerun, a TORN one (writer died
  * mid-commit, no `_SUCCESS`) is deleted and rewritten. Stages read
  * their upstream STAGE OUTPUT, never recompute it, and every stage is
  * a deterministic pure function of (corpus bytes, upstream parquet) —
  * hash-bucket sampling, min-id component retention, no rand(), no
  * timestamps — so a killed run resumed from any point produces the
  * identical row sets as a one-shot run (`CurationRunSpec` kills it
  * mid-DAG and pins stage-for-stage equality).
  *
  * Scale shape per stage (each already verified by its registry twin):
  * exact dedup is fingerprint-keyed (`q_dedup_keep`), near-dup is the
  * banded minhash miner + large-star CC (`q_minhash_pairs`,
  * `q_dedup_groups`), semantic dedup joins pairs cluster-locally and
  * feeds key-only CC (`q_semdedup_cc`), decontamination broadcasts the
  * bench shingle set (`q_decontaminate_x`), semantic decontamination
  * collects the bounded bench vectors into one fused map-side
  * projection (`q_decontaminate_sem`), cluster balancing aggregates to
  * nlist rows and broadcasts rates back (`q_cluster_sample`), the
  * mixture plan aggregates to |sources| rows and broadcasts back
  * (`q_mix_apply_bpe`), packing is the two-level chunked prefix sum in
  * the epoch-seeded hash order (`q_pack_bpe`'s denomination under
  * `q_pack_shuffled`'s layout) — nothing corpus-scale sits on the
  * driver, and the
  * DAG's intermediate tables are (doc_id)-keyed columns, not copies of
  * the corpus.
  *
  * Usage: `runMain graft.CurationRun <sfDir> <outDir>` — rerun the
  * same command after a crash to resume.
  */
object CurationRun {

  /** Stage names in dependency order. The tokenizer trains BEFORE the
    * mixture: both the mixture shares and the pack windows are
    * DENOMINATED in its subword tokens (the r16 verdict's top gap —
    * a tokenizer the very next stage ignored), so it must exist first.
    * Training on the quality survivors (rather than the post-mix set)
    * is the standard order: the tokenizer sees the full cleaned corpus,
    * then the mixture is balanced in the tokens the trainer will
    * actually consume. */
  val Stages: Seq[String] = Seq("bench", "exact", "neardup", "semdedup",
    "decon", "semdecon", "cluster", "quality", "tokenizer", "mix",
    "pack", "manifest", "report")

  /** Run (or resume) the DAG; returns the stages that RAN this call
    * (complete ones skip). `stopAfter` stops the DAG after the named
    * stage completes — the spec's kill hook. `clusterQuota` is the
    * cluster-balance cap (registry default; at the small fixtures the
    * default rarely binds — clusters sit under 20 members — so the
    * stage passes through, which is the operator's documented
    * under-quota behavior; `CurationRunSpec` also runs a tight quota
    * to pin the BINDING path + its report attribution). */
  /** The pack layouts the run can ship, each the machinery of an
    * already-oracled registry row: `shuffled` (default — the
    * reproducible epoch-seeded permutation, q_pack_shuffled_bpe),
    * `curriculum` (easy-first by unigram perplexity,
    * q_pack_curriculum's ordering under the run's BPE slot counts),
    * `semantic` (in-context windows by embedding cluster,
    * q_pack_semantic's ordering under the BPE counts). */
  val PackLayouts: Set[String] = Set("shuffled", "curriculum", "semantic")

  def run(spark: SparkSession, sfDir: String, outDir: String,
          stopAfter: Option[String] = None,
          clusterQuota: Int = PipelineQueries.ClusterQuota,
          shuffleEpoch: Int = 0,
          packLayout: String = "shuffled"): Seq[String] = {
    require(stopAfter.forall(Stages.contains),
      s"unknown stopAfter stage: $stopAfter")
    require(PackLayouts.contains(packLayout),
      s"unknown packLayout: $packLayout (one of $PackLayouts)")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val embs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    def stage(name: String): DataFrame =
      spark.read.parquet(s"$outDir/$name")
    // the embedding rows of a (doc_id)-keyed survivor stage — the one
    // place ids cross INTO the embedding modality (a key-only semi-join)
    def embOf(survivors: DataFrame): DataFrame =
      embs.join(survivors.select(col("doc_id").as("vec_id")),
        Seq("vec_id"), "left_semi")
    // each builder reads ONLY upstream stage parquet + the corpus
    val build: Map[String, () => DataFrame] = Map(
      // held-out eval population: one hash family, never mutated
      "bench" -> (() => docs
        .where(TA.hashBucket(col("doc_id"), CurationQueries.BenchBuckets)
          === CurationQueries.BenchBucket)
        .select("doc_id")),
      // exact dedup over the TRAIN side (bench held out first):
      // fingerprint-keyed keep-min-id — (doc_id) keepers
      "exact" -> (() => Dedup.dedupKeepRows(
          docs.join(stage("bench"), Seq("doc_id"), "left_anti"),
          "doc_id", "text")
        .select("doc_id")),
      // near-dup components over the exact keepers: banded minhash
      // pairs → CC → keep each component's min id (singletons keep)
      "neardup" -> (() => {
        val kept = docs.join(stage("exact"), Seq("doc_id"), "left_semi")
        val drop = Dedup.connectedComponents(
            Dedup.minhashPairs(kept, "doc_id", "text"), pairsDistinct = true)
          .where(col("doc_id") =!= col("component_rep"))
          .select("doc_id")
        kept.join(drop, Seq("doc_id"), "left_anti").select("doc_id")
      }),
      // SEMANTIC dedup over the near-dup survivors: embedding-space
      // components (q_semdedup_cc's machinery — cluster-local
      // above-threshold pairs → CC), keep each component's min id;
      // paraphrased/re-worded duplicates share no shingles but sit on
      // top of each other in embedding space
      "semdedup" -> (() => {
        val kept = stage("neardup")
        val drop = Similarity.semDedupCC(embOf(kept), "vec_id", "embedding")
          .where(col("dropped") === 1)
          .select(col("vec_id").as("doc_id"))
        kept.join(drop, Seq("doc_id"), "left_anti").select("doc_id")
      }),
      // benchmark decontamination: drop survivors sharing 5-gram
      // shingles with the held-out bench docs (broadcast bench side)
      "decon" -> (() => {
        val kept = docs.join(stage("semdedup"), Seq("doc_id"), "left_semi")
        val bench = docs.join(stage("bench"), Seq("doc_id"), "left_semi")
        kept.join(CurationQueries.decontaminateAgainst(kept, bench)
            .select("doc_id"), Seq("doc_id"), "left_anti")
          .select("doc_id")
      }),
      // SEMANTIC decontamination: the same held-out population's
      // EMBEDDINGS (one holdout across modalities), bounded bench-side
      // collect riding into one fused map-side BestCosine projection
      // (q_decontaminate_sem's machinery) — catches the paraphrased
      // bench leakage the shingle gate structurally misses
      "semdecon" -> (() => {
        val kept = stage("decon")
        val contaminated = Similarity.decontaminateSem(
            embOf(kept), embOf(stage("bench")), "vec_id", "embedding",
            PipelineQueries.SemDeconMinCos)
          .select(col("vec_id").as("doc_id"))
        kept.join(contaminated, Seq("doc_id"), "left_anti")
          .select("doc_id")
      }),
      // cluster-balanced sampling: cap every embedding cluster at the
      // quota via the deterministic md5 draw (q_cluster_sample's
      // machinery) so over-represented modes stop dominating the mix;
      // docs whose embedding loses the draw drop, docs without an
      // embedding pass through
      "cluster" -> (() => {
        val kept = stage("semdecon")
        val keptEmb = embOf(kept)
        val survivors = Similarity.clusterSample(keptEmb, "vec_id",
            "embedding", clusterQuota)
          .select(col("vec_id").as("doc_id"))
        val drop = keptEmb.select(col("vec_id").as("doc_id"))
          .join(survivors, Seq("doc_id"), "left_anti")
        kept.join(drop, Seq("doc_id"), "left_anti").select("doc_id")
      }),
      // quality floor: the audit battery's gate, applied
      "quality" -> (() => docs
        .join(stage("cluster"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          TA.qualityScore(col("text"), PipelineQueries.Stopwords)
            .as("quality"),
          TA.tokenCount(col("text")).as("n_tokens"))
        .where(col("quality") >= CurationQueries.AuditQualityMin)),
      // post-curation tokenizer: BPE merges trained on the quality
      // survivors — the subword artifact the downstream trainer loads
      // AND the denomination of every stage below (q_bpe_train's
      // machinery; the one corpus-scale job is the word count, the
      // merge loop iterates on the vocabulary table)
      "tokenizer" -> (() => Bpe.mergesDf(spark,
        Bpe.trainMerges(Bpe.wordCounts(
          docs.join(stage("quality"), Seq("doc_id"), "left_semi"),
          "text"), numMerges = 16))),
      // mixture: per-source TOKENIZER-token-share plan over the
      // survivors, hash-bucket downsampling (deterministic,
      // id-order-free) — shares denominated in the trained subword
      // tokens (q_mix_plan_bpe/q_mix_apply_bpe's oracle-pinned
      // machinery), not whitespace words
      "mix" -> (() => CurationQueries.mixApplyOf(
        docs.join(stage("quality"), Seq("doc_id"), "left_semi"),
        nTok = Bpe.docTokenCountExpr(col("text"),
          Bpe.mergesFrom(stage("tokenizer"))))),
      // pack the final kept docs into context windows of 2048
      // TOKENIZER tokens (q_pack_bpe's oracle-pinned denomination) in
      // the chosen LAYOUT — shuffled by default (production packers
      // never ship id-order shards: arrival-order ids put each source
      // in long same-source runs, and the seeded hash keeps the
      // permutation reproducible, resume ≡ one-shot, with the next
      // epoch one parameter away); curriculum and semantic expose the
      // other two oracled orderings under the same BPE slot counts
      "pack" -> (() => {
        val kept = docs.join(stage("mix"), Seq("doc_id"), "left_semi")
        def bpeTok = Bpe.docTokenCountExpr(col("text"),
          Bpe.mergesFrom(stage("tokenizer")))
        packLayout match {
          case "shuffled" => CurationQueries.packRowsShuffledOf(
            kept, epoch = shuffleEpoch, nTok = bpeTok)
          case "curriculum" => CurationQueries.packRowsCurriculumOf(
            kept, nTok = Some(bpeTok))
          case "semantic" => CurationQueries.packRowsSemanticOf(
            kept, embOf(kept), nlist = 16, idWidth = 512, nTok = bpeTok)
        }
      }),
      // writer manifest: one row per shard — the loader sidecar; the
      // layout + epoch ride along so a loader resuming mid-run knows
      // WHICH order the shards are laid out in
      "manifest" -> (() => stage("pack")
        .groupBy("bin")
        .agg(count(lit(1)).as("n_slices"),
          sum(col("tok_to") - col("tok_from")).as("n_tokens"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .withColumn("layout", lit(packLayout))
        .withColumn("epoch", lit(shuffleEpoch))),
      // per-feed drop report: every doc's FIRST failing gate, rolled
      // up to (source, status) — the operator's one-page audit
      "report" -> (() => docs
        .join(stage("bench").withColumn("_b", lit(1)), Seq("doc_id"), "left")
        .join(stage("exact").withColumn("_e", lit(1)), Seq("doc_id"), "left")
        .join(stage("neardup").withColumn("_n", lit(1)), Seq("doc_id"), "left")
        .join(stage("semdedup").withColumn("_sd", lit(1)), Seq("doc_id"), "left")
        .join(stage("decon").withColumn("_d", lit(1)), Seq("doc_id"), "left")
        .join(stage("semdecon").withColumn("_sc", lit(1)), Seq("doc_id"), "left")
        .join(stage("cluster").withColumn("_cl", lit(1)), Seq("doc_id"), "left")
        .join(stage("quality").select(col("doc_id"), lit(1).as("_q")),
          Seq("doc_id"), "left")
        .join(stage("mix").select(col("doc_id"), lit(1).as("_m")),
          Seq("doc_id"), "left")
        .select(col("source"),
          when(col("_b") === 1, lit("bench"))
            .when(col("_e").isNull, lit("exact_dup"))
            .when(col("_n").isNull, lit("near_dup"))
            .when(col("_sd").isNull, lit("sem_dup"))
            .when(col("_d").isNull, lit("contaminated"))
            .when(col("_sc").isNull, lit("sem_contaminated"))
            .when(col("_cl").isNull, lit("cluster_capped"))
            .when(col("_q").isNull, lit("low_quality"))
            .when(col("_m").isNull, lit("mix_downsampled"))
            .otherwise(lit("kept")).as("status"))
        .groupBy("source", "status")
        .agg(count(lit(1)).as("n"))))
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = Stages.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val name = it.next()
      if (ShardWrite.claim(spark, s"$outDir/$name")) {
        build(name)().write.parquet(s"$outDir/$name")
        ran += name
      }
      if (stopAfter.contains(name)) stop = true
    }
    ran.toSeq
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CurationRun <sfDir> <outDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionTuning.tuned(SparkSession.builder())
      .withExtensions(new GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ran = run(spark, args(0), args(1))
    val skipped = Stages.filterNot(ran.contains)
    println(s"[curation] ran: ${ran.mkString(", ")}" +
      (if (skipped.nonEmpty) s"; resumed past: ${skipped.mkString(", ")}"
       else ""))
    val report = spark.read.parquet(s"${args(1)}/report")
      .orderBy("source", "status").collect()
    report.foreach(r => println(
      s"[curation] ${r.getString(0)} ${r.getString(1)}: ${r.getLong(2)}"))
    spark.stop()
  }
}
