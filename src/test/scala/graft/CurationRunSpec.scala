package graft

import org.apache.spark.sql.functions._

/** The one-command curation DAG ([[CurationRun]]): one-shot vs
  * killed-and-resumed equality, stage for stage — the r15 verdict's
  * "done" bar for item 4. */
class CurationRunSpec extends SparkSpec {

  private def rows(dir: String): Set[String] =
    spark.read.parquet(dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("killed mid-DAG and resumed equals the one-shot run, stage for stage") {
    val out1 = java.nio.file.Files.createTempDirectory("cur-oneshot").toString
    val out2 = java.nio.file.Files.createTempDirectory("cur-resumed").toString
    val ran1 = CurationRun.run(spark, sf0001, out1)
    assert(ran1 == CurationRun.Stages, s"one-shot must run every stage: $ran1")
    // the kill: the DAG dies after decon — and the next stage is TORN
    // (its dir exists with partial bytes but no _SUCCESS: a writer
    // killed mid-commit)
    val ran2a = CurationRun.run(spark, sf0001, out2,
      stopAfter = Some("decon"))
    assert(ran2a == Seq("bench", "exact", "neardup", "semdedup", "decon"))
    val f = new org.apache.hadoop.fs.Path(out2).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(s"$out2/semdecon")
    f.mkdirs(torn)
    val o = f.create(new org.apache.hadoop.fs.Path(torn, "part-junk.parquet"), true)
    o.write("not parquet".getBytes("UTF-8")); o.close()
    // resume: complete stages skip, the torn one heals and rewrites,
    // the rest run
    val ran2b = CurationRun.run(spark, sf0001, out2)
    assert(ran2b == Seq("semdecon", "cluster", "quality", "tokenizer",
      "mix", "pack", "manifest", "report"),
      s"resume must skip the complete prefix and heal the torn stage: $ran2b")
    // stage-for-stage equality with the one-shot run
    for (s <- CurationRun.Stages)
      assert(rows(s"$out1/$s") == rows(s"$out2/$s"), s"stage $s diverged")
    // a second resume is a complete no-op
    assert(CurationRun.run(spark, sf0001, out2).isEmpty)
    // report sanity: statuses partition the corpus (every doc exactly
    // one status), and the pipeline actually kept something
    val total = Tables.documents(spark, sf0001).count()
    val rep = spark.read.parquet(s"$out1/report")
    assert(rep.agg(sum("n")).head.getLong(0) == total,
      "the drop report must cover every document exactly once")
    assert(rep.where(col("status") === "kept")
      .agg(coalesce(sum("n"), lit(0L))).head.getLong(0) > 0L)
    // the cross-modal gates BIND on the fixture and the report
    // attributes them by first-failing-gate: since the stages are
    // nested survivor sets, sem_dup must equal |neardup| − |semdedup|
    // and sem_contaminated must equal |decon| − |semdecon|
    val byStatus = rep.groupBy("status").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def stageCount(s: String) = spark.read.parquet(s"$out1/$s").count()
    assert(byStatus.getOrElse("sem_dup", 0L) > 0L,
      "semantic dedup must bind on the seeded fixture")
    assert(byStatus.getOrElse("sem_contaminated", 0L) > 0L,
      "semantic decontamination must bind on the seeded fixture")
    assert(byStatus("sem_dup") == stageCount("neardup") - stageCount("semdedup"))
    assert(byStatus("sem_contaminated") ==
      stageCount("decon") - stageCount("semdecon"))
    assert(byStatus.getOrElse("cluster_capped", 0L) ==
      stageCount("semdecon") - stageCount("cluster"))
    // the tokenizer artifact is trained and non-degenerate: ranked
    // merges over the kept corpus
    val merges = spark.read.parquet(s"$out1/tokenizer")
      .orderBy("merge_rank").collect()
    assert(merges.length == 16)
    assert(merges.map(_.getAs[Int]("merge_rank")).toSeq == (1 to 16))
    // pack tiling invariant: every bin but the corpus-final one holds
    // exactly 2048 tokens
    val bins = spark.read.parquet(s"$out1/manifest")
      .orderBy(col("bin").desc).collect()
    assert(bins.drop(1).forall(_.getAs[Long]("n_tokens") == 2048L))
    // the pack is DENOMINATED in the run's own trained tokenizer: the
    // manifest's total token mass equals the BPE subword count of the
    // mix survivors under the tokenizer stage's merges — and differs
    // from the whitespace word mass (the tokenizer is not a word
    // counter)
    val trained = graft.functions.Bpe.mergesFrom(
      spark.read.parquet(s"$out1/tokenizer"))
    val kept = Tables.documents(spark, sf0001)
      .join(spark.read.parquet(s"$out1/mix").select("doc_id"),
        Seq("doc_id"), "left_semi")
    val Seq(bpeMass, wsMass) = kept.agg(
        sum(graft.functions.Bpe.docTokenCountExpr(col("text"), trained)
          .cast("long")),
        sum(graft.functions.TextAnalysis.tokenCount(col("text"))
          .cast("long")))
      .head().toSeq.map(_.asInstanceOf[Long])
    val packed = spark.read.parquet(s"$out1/manifest")
      .agg(sum("n_tokens")).head().getLong(0)
    assert(packed == bpeMass,
      s"pack must tile the BPE token mass: packed=$packed bpe=$bpeMass")
    assert(bpeMass != wsMass,
      "fixture degenerate: BPE and whitespace masses coincide")
    // the pack layout is the epoch-seeded SHUFFLE of the kept corpus:
    // byte-equal to the registry machinery at the run's epoch, and a
    // genuinely different permutation from the id-order layout
    import graft.queries.CurationQueries
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val bpeTok = graft.functions.Bpe.docTokenCountExpr(col("text"), trained)
    assert(rows(s"$out1/pack") ==
      canon(CurationQueries.packRowsShuffledOf(kept, epoch = 0, nTok = bpeTok)),
      "the run's pack must equal q_pack_shuffled's machinery at epoch 0")
    def startBins(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.where(col("tok_from") === 0L).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap
    assert(startBins(spark.read.parquet(s"$out1/pack")) !=
      startBins(CurationQueries.packRowsOf(kept, nTok = bpeTok)),
      "the shuffled layout must differ from the id-order layout")
    // the manifest records the permutation epoch the shards follow
    assert(spark.read.parquet(s"$out1/manifest")
      .select("epoch").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("pack layouts: curriculum and semantic runs ship their oracled orderings") {
    import graft.queries.CurationQueries
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    for (layout <- Seq("curriculum", "semantic")) {
      val out = java.nio.file.Files.createTempDirectory(s"cur-$layout").toString
      CurationRun.run(spark, sf0001, out, packLayout = layout)
      val trained = graft.functions.Bpe.mergesFrom(
        spark.read.parquet(s"$out/tokenizer"))
      val kept = Tables.documents(spark, sf0001)
        .join(spark.read.parquet(s"$out/mix").select("doc_id"),
          Seq("doc_id"), "left_semi")
      val bpeTok = graft.functions.Bpe.docTokenCountExpr(col("text"), trained)
      val want = layout match {
        case "curriculum" =>
          CurationQueries.packRowsCurriculumOf(kept, nTok = Some(bpeTok))
        case _ =>
          val embKept = Tables.embeddings(spark, sf0001)
            .select(col("vec_id"), col("embedding"))
            .join(kept.select(col("doc_id").as("vec_id")),
              Seq("vec_id"), "left_semi")
          CurationQueries.packRowsSemanticOf(kept, embKept,
            nlist = 16, idWidth = 512, nTok = bpeTok)
      }
      assert(rows(s"$out/pack") == canon(want),
        s"$layout run pack must equal its registry machinery")
      assert(spark.read.parquet(s"$out/manifest")
        .select("layout").distinct().collect().map(_.getString(0)).toSeq ==
        Seq(layout), s"$layout manifest must record the layout")
      // layouts permute, never change mass: full windows still tile
      val bins = spark.read.parquet(s"$out/manifest")
        .orderBy(col("bin").desc).collect()
      assert(bins.drop(1).forall(_.getAs[Long]("n_tokens") == 2048L),
        s"$layout tiling invariant")
    }
  }

  test("a binding cluster quota drops docs and the report attributes them") {
    // the default quota (20) sits above the fixture's ~13-member
    // clusters — the pass-through path the main test reconciles at 0;
    // this run tightens the quota so the gate BINDS and the
    // first-failing-gate attribution is exercised for cluster_capped
    val out = java.nio.file.Files.createTempDirectory("cur-quota").toString
    CurationRun.run(spark, sf0001, out, clusterQuota = 4)
    val rep = spark.read.parquet(s"$out/report")
    val capped = rep.where(col("status") === "cluster_capped")
      .agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
    assert(capped > 0L, "quota 4 must cap at least one cluster")
    def stageCount(s: String) = spark.read.parquet(s"$out/$s").count()
    assert(capped == stageCount("semdecon") - stageCount("cluster"))
    assert(rep.agg(sum("n")).head.getLong(0) ==
      Tables.documents(spark, sf0001).count())
    assert(rep.where(col("status") === "kept")
      .agg(coalesce(sum("n"), lit(0L))).head.getLong(0) > 0L)
  }
}
