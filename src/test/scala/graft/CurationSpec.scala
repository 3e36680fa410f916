package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextAnalysis => TA}
import graft.queries.CurationQueries

/** Curation operators: chunking, quality top-p, mixture planning,
  * decontamination, SemDeDup — planted-fixture semantics. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("chunksOf: sliding windows cover every token with the planted overlap") {
    // 100 numbered tokens -> starts 0,30,60,90: sizes 40,40,40,10
    val text = (0 until 100).map(i => s"t$i").mkString(" ")
    val rows = CurationQueries.chunksOf(Seq((7L, text)).toDF("doc_id", "text"))
      .orderBy("chunk_idx").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Int]("n_chunk_tokens")).toSeq == Seq(40, 40, 40, 10))
    val texts = rows.map(_.getAs[String]("chunk_text"))
    assert(texts(0).startsWith("t0 t1 ") && texts(0).endsWith(" t39"))
    assert(texts(3) == (90 until 100).map(i => s"t$i").mkString(" "))
    // overlap invariant: each full chunk's last 10 tokens are the next
    // chunk's first 10
    for (i <- 0 until 2) {
      assert(texts(i).split(" ").takeRight(10).toSeq ==
        texts(i + 1).split(" ").take(10).toSeq)
    }
    // short doc: one chunk, intact
    val one = CurationQueries.chunksOf(Seq((1L, "a b c")).toDF("doc_id", "text"))
      .collect()
    assert(one.length == 1 && one.head.getAs[String]("chunk_text") == "a b c")
  }

  test("cdcChunksOf: reconstruction + shift-robust boundaries") {
    import graft.functions.Dedup
    val words = (0 until 120).map(i => s"tok$i")
    val text = words.mkString(" ")
    def chunksOf(t: String): Seq[(Int, String)] =
      CurationQueries.cdcChunksOf(Seq((1L, t)).toDF("doc_id", "text"))
        .orderBy("chunk_idx")
        .collect().map(r => r.getAs[Int]("chunk_idx") -> r.getAs[String]("chunk_text")).toSeq
    val base = chunksOf(text)
    // chunks concatenated in order reconstruct the document exactly
    assert(base.map(_._2).mkString(" ") == text)
    // boundary rule matches the hash: a chunk's LAST token hashes to 0
    // mod 16 (except possibly the final chunk; no forced cuts — the doc
    // is shorter than the 256-token cap). ONE batched hash job, not one
    // per chunk.
    val lastToks = base.init.map(_._2.split(" ").last)
    val hashes = lastToks.toDF("t")
      .select(col("t"), Dedup.md5Hash60(col("t")) % 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    lastToks.foreach(t => assert(hashes(t) == 0L, t))
    // CONTENT-DEFINED robustness: prepend a token — every chunk after
    // the first boundary is identical to the unedited document's chunks
    // (fixed-stride chunking shifts every window instead)
    val shifted = chunksOf("inserted " + text)
    val commonTail = base.map(_._2).toSet.intersect(shifted.map(_._2).toSet)
    assert(commonTail.size >= base.size - 1,
      s"expected all but the first chunk shared, got ${commonTail.size}/${base.size}")
    // degenerate doc (one repeated non-boundary token): the forced-cut
    // cap bounds every chunk at 256 tokens instead of one unbounded
    // aggregation buffer
    val nonBoundary = (0 until 50).map(i => s"nb$i").toDF("t")
      .select(col("t"), Dedup.md5Hash60(col("t")) % 16)
      .collect().collectFirst { case r if r.getLong(1) != 0L => r.getString(0) }.get
    val degenerate = chunksOf(((1 to 600).map(_ => nonBoundary)).mkString(" "))
    assert(degenerate.size == 3) // 600 tokens / 256-cap -> 256+256+88
    assert(degenerate.forall(_._2.split(" ").length <= 256))
  }

  test("qualityTopPOf: keeps the better half per language") {
    val stop = "the a of and to in is"
    // per lang: two docs, one prose-like (high quality), one degenerate
    val docs = Seq(
      (1L, ("the quick brown fox jumps over " + stop + " ") * 6, "en"),
      (2L, "zz", "en"),
      (3L, ("the quick brown fox jumps over " + stop + " ") * 6, "es"),
      (4L, "qq", "es")).toDF("doc_id", "text", "lang")
    val kept = CurationQueries.qualityTopPOf(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("qualityTopPOf decomposition is bit-equal to the percent_rank window") {
    // the decomposed per-language rank (bucketed row_number + tiny
    // offsets frame) must reproduce percent_rank EXACTLY — same rank
    // integers, same double division — including single-doc languages
    // (percent_rank's 0.0 special case) and tie-heavy score runs
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text", "lang")
      .union(Seq(
        (100001L, Option("one lonely doc"), Option("xx")),
        // null lang: its own percent_rank partition (single doc → 0.0)
        (100002L, Option("a doc with no language tag"), None),
        // null text → null quality: NULLS-LAST in the DESC order, must
        // survive the decomposition's join, not silently vanish
        (100003L, None: Option[String], Option("xx")))
        .toDF("doc_id", "text", "lang"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), r.getDouble(3))).toSet
    val dec = canon(CurationQueries.qualityTopPOf(docs))
    val win = canon(CurationQueries.qualityTopPWindowed(docs))
    spark.catalog.clearCache()
    assert(dec == win && dec.nonEmpty)
    // the lonely language's only doc has q_rank exactly 0.0 and is kept
    assert(dec.exists { case (id, lang, _, qr) => lang == "xx" && qr == 0.0 })
  }

  test("mixPlanOf: shares and capped sampling rates from planted counts") {
    // srcA: 30 tokens, srcB: 10 tokens -> total 40, uniform target 20/source
    val docs = Seq(
      (1L, (1 to 15).map(_ => "w").mkString(" "), "srcA"),
      (2L, (1 to 15).map(_ => "w").mkString(" "), "srcA"),
      (3L, (1 to 10).map(_ => "w").mkString(" "), "srcB"))
      .toDF("doc_id", "text", "source")
    val got = CurationQueries.mixPlanOf(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
         r.getAs[Double]("token_share"), r.getAs[Double]("sampling_rate"))).toMap
    assert(got("srcA") == ((2L, 30L, 0.75, 20.0 / 30.0)))
    assert(got("srcB") == ((1L, 10L, 0.25, 1.0))) // capped at 1: cannot upsample
  }

  test("mixApplyOf: keeps full-rate sources whole, downsamples the rest by hash") {
    // srcA rate = 2/3 (overweight), srcB rate = 1.0 (under target)
    val docs = (0L until 40L).map { i =>
      val src = if (i < 30) "srcA" else "srcB"
      (i, (1 to 10).map(_ => "w").mkString(" "), src)
    }.toDF("doc_id", "text", "source")
    // plan: A 300 tokens, B 100 -> total 400, target 200/source
    // -> rate A = 200/300, rate B = 1.0
    val kept = CurationQueries.mixApplyOf(docs)
      .collect().map(r => r.getLong(0)).toSet
    assert((30L until 40L).forall(kept)) // rate 1.0: every srcB doc kept
    val rateA = 200.0 / 300.0
    // ONE batched hash job for all 30 ids, not one per id
    val buckets = spark.range(0, 30)
      .select(col("id"), functions.TextAnalysis.hashBucket(col("id"), 1000000))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedA = (0L until 30L).filter(buckets(_) < rateA * 1000000).toSet
    assert(kept.filter(_ < 30L) == expectedA && expectedA.nonEmpty
      && expectedA.size < 30)
    // deterministic: a second run keeps the identical set
    assert(CurationQueries.mixApplyOf(docs)
      .collect().map(_.getLong(0)).toSet == kept)
  }

  test("decontaminateOf: flags exactly the train docs sharing a bench shingle") {
    // find one bench-bucket id and two train-bucket ids deterministically
    val ids = spark.range(0, 200)
      .select(col("id"), TA.hashBucket(col("id"), 16).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val benchId = ids.collectFirst { case (i, b) if b == 15 => i }.get
    val Seq(cleanId, dirtyId) = ids.collect { case (i, b) if b != 15 => i }.take(2).toSeq
    val shared = "alpha beta gamma delta epsilon" // one 5-shingle
    val docs = Seq(
      (benchId, s"$shared zeta eta theta iota kappa"),
      (dirtyId, s"prefix words here then $shared and a tail of words"),
      (cleanId, "completely different tokens with no overlap at all nine ten"))
      .toDF("doc_id", "text")
    val got = CurationQueries.decontaminateOf(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("doc_id") == dirtyId)
    assert(r.getAs[Long]("n_hits") == 1L)
    assert(r.getAs[Double]("contam_frac") ==
      1.0 / r.getAs[Long]("n_shingles"))
  }

  test("decontaminateAgainst: two-corpus form flags planted contamination") {
    val shared = "alpha beta gamma delta epsilon" // one 5-shingle
    val bench = Seq((100L, s"$shared zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, s"prefix words here then $shared and a tail of words"),
      (2L, "completely different tokens with no overlap at all nine ten"))
      .toDF("doc_id", "text")
    val got = CurationQueries.decontaminateAgainst(train, bench).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("doc_id") == 1L)
    assert(got.head.getAs[Long]("n_hits") == 1L)
  }

  test("decontaminateAgainst on the fixture bucket split == decontaminateOf") {
    // the split commutes with shingling: feeding the bench bucket as a
    // separate corpus must reproduce the single-corpus twin exactly
    val docs = Tables.documents(spark, sf0001)
    val bucket = TA.hashBucket(col("doc_id"), 16)
    val two = CurationQueries.decontaminateAgainst(
        docs.where(bucket =!= 15), docs.where(bucket === 15))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = CurationQueries.decontaminateOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(two == one && two.nonEmpty)
    spark.catalog.clearCache() // decontaminateOf's documented contract
  }

  test("cache-bearing operators trigger no Spark jobs at construction time") {
    // the lazy-cache contract: building the DataFrame is free; the first
    // ACTION materializes shared intermediates. A construction-time job
    // would surprise composing callers (and broke API expectations in r4
    // review). Counted via listener; a marker action then fences event
    // delivery (events arrive in order, so once the marker's job event
    // lands, any earlier job event would already have landed).
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.add(js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString("; "))
    }
    spark.catalog.clearCache()
    // the parquet read runs its own schema-inference job — construct the
    // input BEFORE the listener so only operator-construction work counts
    val docs = Tables.documents(spark, sf0001)
    spark.sparkContext.addSparkListener(listener)
    try {
      CurationQueries.decontaminateOf(docs)
      CurationQueries.tokenBudgetOf(docs)
      CurationQueries.qualityTopPOf(docs)
      CurationQueries.decontaminateAgainst(
        docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1))
      functions.TextAnalysis.unigramXent(docs, "doc_id", "text")
      functions.Dedup.jaccardPairs(docs, "doc_id", "text", 5)
      // marker: an RDD action — exactly ONE job, no AQE stage jobs —
      // and the only job this test may observe
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.currentTimeMillis + 30000
      while (jobs.isEmpty && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(jobs.size == 1 && jobs.peek().contains("count at"),
        s"expected only the marker job, saw ${jobs.size}: " +
          jobs.toArray.mkString(" | ") +
          " — an operator ran work at DataFrame-construction time")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
    }
  }

  test("dropReasonsOf attributes the first failing gate per document") {
    val ids = spark.range(0, 300)
      .select(col("id"), TA.hashBucket(col("id"), 16).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val benchId = ids.collectFirst { case (i, b) if b == 15 => i }.get
    val Seq(dupA, dupB, contamId, lowQId, goodId) =
      ids.collect { case (i, b) if b != 15 => i }.take(5).toSeq
    val shared = "alpha beta gamma delta epsilon" // one bench 5-shingle
    val prose = ("the quick brown fox jumps over the a of and to in is " * 6).trim
    val docs = Seq(
      (benchId, s"$shared zeta eta theta iota kappa"),
      (dupA, prose),                                   // keeper of the dup pair
      (dupB, prose),                                   // exact_dup (higher id...
      (contamId, s"prefix words then $shared and a long tail here"),
      (lowQId, "zz"),
      (goodId, prose + " unique suffix tokens here"))
      .toDF("doc_id", "text")
    val got = CurationQueries.dropReasonsOf(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    spark.catalog.clearCache()
    assert(got(benchId) == "bench")
    // min-id keeps: whichever of the pair is smaller is the keeper
    val (keeper, dup) = if (dupA < dupB) (dupA, dupB) else (dupB, dupA)
    assert(got(dup) == "exact_dup")
    assert(got(keeper) == "kept")
    assert(got(contamId) == "contaminated")
    assert(got(lowQId) == "low_quality")
    assert(got(goodId) == "kept")
    assert(got.size == 6) // statuses partition the corpus: one row per doc
  }

  test("dedupCapOf: keeps at most two copies per planted boilerplate group") {
    // ids 0..29: %7==0 -> 0,7,14,21,28 share one boilerplate fp
    val docs = (0L until 30L).map(i => (i, s"unique text number $i with some words"))
      .toDF("doc_id", "text")
    val got = CurationQueries.dedupCapOf(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val boiler = Set(0L, 7L, 14L, 21L, 28L)
    assert(got.keySet.intersect(boiler) == Set(0L, 7L)) // cap = 2, min ids win
    assert(got(0L) == 1 && got(7L) == 2)
    assert((0L until 30L).filterNot(boiler).forall(i => got(i) == 1))
  }

  test("tokenBudgetOf: two-level prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    val stop = "the a of and to in is"
    // varied lengths/qualities so docs spread across quality buckets
    val docs = (0L until 60L).map { i =>
      val reps = 1 + (i % 7).toInt
      (i, (s"some words $stop number $i " * reps).trim)
    }.toDF("doc_id", "text")
    val budget = 800L
    val naive = docs.select(col("doc_id"),
        functions.TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "and", "to", "in", "is")).as("quality"),
        functions.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        Window.orderBy(col("quality").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .where(col("cum_tokens") <= budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    val got = CurationQueries.tokenBudgetOf(docs, budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    assert(got == naive && got.nonEmpty && got.size < 60)
  }

  test("semDedup: drops the higher-id member of close same-cluster pairs") {
    // seeds = first 2 vectors: v1 -> cluster axis x, v2 -> cluster axis y;
    // v5/v6 are near-copies of v1/v2, v3/v4 are same-cluster but distant
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.8f, 0.6f)),   // cos(v1,v3)=0.8 < 0.9 -> kept
      (4L, Seq(0.6f, 0.8f)),   // cos(v2,v4)=0.8 < 0.9 -> kept
      (5L, Seq(1.0f, 0.001f)), // ~v1 -> dropped
      (6L, Seq(0.001f, 1.0f))) // ~v2 -> dropped
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedup(emb, "vec_id", "embedding",
        nlist = 2, minCos = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cid"), r.getAs[Int]("dropped"))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.filter(_._2._2 == 1).keySet == Set(5L, 6L))
    // cluster assignment follows the nearest seed
    assert(got(1L)._1 == got(3L)._1 && got(1L)._1 == got(5L)._1)
    assert(got(2L)._1 == got(4L)._1 && got(2L)._1 == got(6L)._1)
    assert(got(1L)._1 != got(2L)._1)
  }

  test("pipelineSemantic composes semdedup drops with the quality gate") {
    val got = CurationQueries.pipelineSemantic(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val dropped = Similarity.semDedup(
        Tables.embeddings(spark, sf0001), "vec_id", "embedding")
      .where(col("dropped") === 1).select("vec_id").as[Long].collect().toSet
    val expected = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        functions.TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "and", "to", "in", "is")).as("q"))
      .where(col("q") >= 0.5).select("doc_id").as[Long].collect().toSet -- dropped
    assert(got == expected && got.nonEmpty)
  }

  test("boilerplateOf surfaces the planted shared shingle, respects minDf") {
    import graft.queries.PipelineQueries
    val boiler = "all rights reserved by the company"
    val docs = (0L until 10L).map { i =>
      val body = s"unique filler words number $i go here now"
      (i, if (i < 4) s"$body $boiler" else body)
    }.toDF("doc_id", "text")
    val got = PipelineQueries.boilerplateOf(docs, minDf = 3, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // only shingles of the planted tail appear in >= 3 docs
    assert(got.nonEmpty && got.forall(_._2 == 4L))
    assert(got.exists(_._1 == "rights reserved by the company"))
    // TakeOrderedAndProject, never a global sort of the shingle table
    val plan = PipelineQueries.boilerplateOf(docs, 3, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("unigramXent: exact cross-entropy on a planted corpus") {
    // corpus tokens: a a b -> p(a)=2/3, p(b)=1/3
    val docs = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val got = functions.TextAnalysis.unigramXent(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val xa = -math.log(2.0 / 3.0)
    val xb = -math.log(1.0 / 3.0)
    assert(got(1L)._1 == 2L && math.abs(got(1L)._2 - xa) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - xb) < 1e-12)
    // common-token doc scores LOWER xent than rare-token doc, ppl = e^xent
    assert(got(1L)._2 < got(2L)._2)
    assert(math.abs(got(2L)._3 - math.exp(xb)) < 1e-9)
  }

  test("semDedup is deterministic across runs") {
    val emb = Tables.embeddings(spark, sf0001)
    def run() = Similarity.semDedup(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(run() == run())
  }

  test("packSequencesOf: two-level decomposition equals the sequential fold; straddlers keep their start bin") {
    import graft.queries.CurationQueries
    // sparse ids across chunk boundaries (chunkWidth=64), token counts
    // sized so docs straddle seqLen=1024 windows
    val sizes = Seq(0L -> 5, 1L -> 2000, 2L -> 100, 63L -> 3000,
      64L -> 10, 700L -> 2048, 700000L -> 7)
    val docs = sizes.map { case (id, n) =>
      (id, (0 until n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    val out = CurationQueries.packSequencesOf(docs, seqLen = 1024, chunkWidth = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // the sequential spelling the decomposition must be bit-equal to
    var cum = 0L
    for ((id, n) <- sizes.sortBy(_._1)) {
      val (nt, bin, off) = out(id)
      assert(nt == n, s"doc $id token count")
      assert(bin == cum / 1024, s"doc $id bin: got $bin, want ${cum / 1024}")
      assert(off == cum % 1024, s"doc $id offset")
      cum += n
    }
    // doc 1 (starts at 5, 2000 tokens) straddles windows 0..1 but is
    // assigned its START window
    assert(out(1L)._2 == 0L && out(2L)._2 == (5L + 2000) / 1024)
  }

  test("packRowsOf: slices tile every window exactly; per-doc slices reassemble the doc") {
    import graft.queries.CurationQueries
    // same corpus shape as the packSequencesOf test (note an
    // empty-STRING doc still counts one token — the tokenizer's
    // split('') == [''] convention, identical in both engines — so the
    // n_tokens > 0 guard only excludes hypothetical zero-count rows)
    val sizes = Seq(0L -> 5, 1L -> 2000, 2L -> 100, 63L -> 3000,
      64L -> 10, 700L -> 2048, 700000L -> 7)
    val docs = sizes.map { case (id, n) =>
      (id, (0 until n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = CurationQueries.packRowsOf(docs, seqLen = 1024, chunkWidth = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every window's slice lengths sum to seqLen, except the corpus-
    // final window (the partial tail) — the pack-writer contract
    val total = sizes.map(_._2.toLong).sum
    val byBin = rows.groupBy(_._2).view
      .mapValues(_.map(s => s._4 - s._3).sum).toMap
    val lastBin = (total - 1) / 1024
    assert(byBin.keySet == (0L to lastBin).toSet, s"bins ${byBin.keySet}")
    for (b <- 0L until lastBin)
      assert(byBin(b) == 1024L, s"bin $b holds ${byBin(b)} tokens")
    assert(byBin(lastBin) == total - lastBin * 1024,
      s"tail bin ${byBin(lastBin)}")
    // per-doc: slices are contiguous [0..n_tokens) in bin order —
    // concatenating them reassembles the document
    val pack = CurationQueries.packSequencesOf(docs, seqLen = 1024, chunkWidth = 64)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    rows.groupBy(_._1).foreach { case (id, ss) =>
      val ordered = ss.sortBy(_._2)
      val (n, startBin) = pack(id)
      assert(ordered.head._2 == startBin, s"doc $id first slice bin")
      assert(ordered.head._3 == 0L, s"doc $id first slice must start at 0")
      assert(ordered.last._4 == n.toLong, s"doc $id last slice must end at n")
      ordered.sliding(2).filter(_.length == 2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a._4 == b._3 && b._2 == a._2 + 1,
          s"doc $id slices not contiguous: $a -> $b")
      }
    }
  }

  test("fimTransformOf: reassembly, cut bounds, salted selection and cut draws") {
    import graft.queries.CurationQueries
    import graft.functions.Md5Long60
    // 20 docs of varied lengths (1..39 tokens); ids 3,4,5,7,9,10,12,
    // 15,17,18 fall under the "fim:" bucket at rate 0.5 — both
    // branches execute
    val docs = (0 until 20).map { i =>
      (i.toLong, (0 until (2 * i + 1)).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = CurationQueries.fimTransformOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5), r.getString(6)))).toMap
    assert(out.values.count(_._1 == 1) == 10, "rate-0.5 selection on this fixture")
    def toks(s: String) = if (s.isEmpty) Seq.empty else s.split(" ").toSeq
    for (i <- 0 until 20) {
      val n = 2 * i + 1
      val (fim, a, b, pre, mid, suf) = out(i.toLong)
      val wantSel =
        Md5Long60.hash60(s"fim:$i".getBytes) % 1000000 < 500000
      assert((fim == 1) == wantSel, s"doc $i selection")
      if (fim == 1) {
        val wantA = Md5Long60.hash60(s"fim_a:$i".getBytes) % (n + 1)
        val wantB = wantA + Md5Long60.hash60(s"fim_b:$i".getBytes) % (n - wantA + 1)
        assert(a == wantA && b == wantB, s"doc $i cuts ($a,$b) want ($wantA,$wantB)")
      } else assert(a == n && b == n && mid.isEmpty && suf.isEmpty,
        s"unselected doc $i must pass through whole")
      assert(0 <= a && a <= b && b <= n)
      // the three slices reassemble the document exactly
      assert(toks(pre) ++ toks(mid) ++ toks(suf) ==
        (0 until n).map(j => s"w$j"), s"doc $i reassembly")
      assert(toks(pre).size == a && toks(mid).size == b - a)
    }
  }

  test("spanCorruptOf: sentinel-splice reconstruction, numbering, counts, rate") {
    import graft.queries.CurationQueries
    val docs = Seq(
      (1L, (0 until 2000).map(i => s"t$i").mkString(" ")),
      (2L, "alpha beta"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = CurationQueries.spanCorruptOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    def toks(s: String) = if (s.isEmpty) Seq.empty[String] else s.split(" ").toSeq
    def isSentinel(t: String) = t.startsWith("<extra_id_")
    for ((id, text) <- Seq(1L -> docs.collect()(0).getString(1),
      2L -> "alpha beta", 3L -> "solo")) {
      val orig = toks(text)
      val (nMasked, nSpans, inputs, targets) = out(id)
      // parse targets into spans keyed by sentinel number
      val spans = scala.collection.mutable.ArrayBuffer[Vector[String]]()
      toks(targets).foreach { t =>
        if (isSentinel(t)) {
          assert(t == s"<extra_id_${spans.size}>",
            s"doc $id sentinel out of order: $t after ${spans.size} spans")
          spans += Vector.empty
        } else spans(spans.size - 1) = spans.last :+ t
      }
      assert(spans.size == nSpans && spans.map(_.size).sum == nMasked,
        s"doc $id span counts")
      assert(spans.forall(_.nonEmpty), s"doc $id empty span")
      // splice each sentinel's span back into inputs → the original doc
      var k = 0
      val rebuilt = toks(inputs).flatMap { t =>
        if (isSentinel(t)) {
          assert(t == s"<extra_id_$k>", s"doc $id inputs sentinel order")
          k += 1; spans(k - 1)
        } else Seq(t)
      }
      assert(k == nSpans, s"doc $id inputs must carry every sentinel once")
      assert(rebuilt == orig, s"doc $id reconstruction diverged")
    }
    // the 2000-token doc corrupts near the designed 15% rate
    val rate = out(1L)._1.toDouble / 2000
    assert(rate > 0.08 && rate < 0.25, s"corruption rate $rate off design")
  }

  test("mixRepeatPlanOf/ApplyOf: integer epoch arithmetic, per-doc copy counts, salted fractional draw") {
    import graft.queries.CurationQueries
    // skewed corpus: "big" dwarfs the target (downsample case,
    // epochs_full = 0), "small" earns multiple whole passes
    val docs = ((0 until 40).map(i => (i.toLong, "big", ("w " * 50).trim)) ++
      (100 until 104).map(i => (i.toLong, "small", ("w " * 30).trim)))
      .toDF("doc_id", "source", "text")
    val plan = CurationQueries.mixRepeatPlanOf(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    // big: 2000 tokens, small: 120, total 2120, target = 2120/2 = 1060
    val (bigTok, bigFull, bigFrac) = plan("big")
    val (smTok, smFull, smFrac) = plan("small")
    assert(bigTok == 2000L && smTok == 120L)
    assert(bigFull == 0L && bigFrac == 1060.0 / 2000, "big is a pure downsample")
    assert(smFull == 8L && smFrac == (1060L % 120).toDouble / 120,
      s"small must earn 1060/120 = 8 whole passes, got $smFull")
    // apply: every doc appears epochs_full or epochs_full+1 times, the
    // whole passes are exactly epochs 0..full-1, and the one
    // fractional admit matches the salted md5 recomputed here
    val out = CurationQueries.mixRepeatApplyOf(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.groupBy(_._1).foreach { case (id, rs) =>
      val (src, full, frac) =
        if (id < 100) ("big", bigFull, bigFrac) else ("small", smFull, smFrac)
      assert(rs.forall(_._2 == src))
      val epochs = rs.map(_._3).sorted.toSeq
      val admit = graft.functions.Md5Long60.hash60(s"$id:$full".getBytes)
        .%(1000000).toDouble < frac * 1000000
      val want = (0L until full) ++ (if (admit) Seq(full) else Nil)
      assert(epochs == want, s"doc $id epochs $epochs, want $want")
    }
    // the fractional pass must not be empty or total on this fixture —
    // otherwise the salted-draw branch went untested
    val fracSmall = out.count(r => r._2 == "small" && r._3 == smFull)
    assert(fracSmall > 0 && fracSmall < 4, s"small fractional admits: $fracSmall")
  }

  test("packRowsShuffledOf: hash-order fold, tiling invariant, epoch determinism") {
    import graft.queries.CurationQueries
    val sizes = Seq(0L -> 5, 1L -> 2000, 2L -> 100, 63L -> 3000,
      64L -> 10, 700L -> 2048, 700000L -> 7)
    val docs = sizes.map { case (id, n) =>
      (id, (0 until n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    def run(epoch: Int) = CurationQueries
      .packRowsShuffledOf(docs, seqLen = 1024, nChunks = 8, epoch = epoch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val rows = run(epoch = 3)
    // the sequential spelling the two-level hash decomposition must be
    // bit-equal to: fold token counts in (md5_60("3:id"), id) order
    val hashOrder = sizes.sortBy { case (id, _) =>
      (graft.functions.Md5Long60.hash60(s"3:$id".getBytes), id)
    }
    var cum = 0L
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for ((id, n) <- hashOrder) {
      var b = cum / 1024
      while (b * 1024 < cum + n) {
        want += ((id, b, math.max(cum, b * 1024) - cum,
          math.min(cum + n, (b + 1) * 1024) - cum))
        b += 1
      }
      cum += n
    }
    assert(rows.sortBy(r => (r._1, r._2)).toSeq ==
      want.sortBy(r => (r._1, r._2)).toSeq,
      "shuffled slices must equal the sequential hash-order fold")
    // the tiling invariant survives the permutation: every window full
    // except the corpus tail, per-doc slice lengths still sum to n
    val total = sizes.map(_._2.toLong).sum
    val byBin = rows.groupBy(_._2).view
      .mapValues(_.map(s => s._4 - s._3).sum).toMap
    val lastBin = (total - 1) / 1024
    for (b <- 0L until lastBin)
      assert(byBin(b) == 1024L, s"bin $b holds ${byBin(b)} tokens")
    assert(byBin(lastBin) == total - lastBin * 1024)
    // same epoch ⇒ byte-identical; a different epoch ⇒ a genuinely
    // different layout (some doc starts in a different window)
    assert(run(epoch = 3).sorted.toSeq == rows.sorted.toSeq,
      "same epoch must reproduce the identical pack")
    val other = run(epoch = 4)
    def startBins(rs: Array[(Long, Long, Long, Long)]) =
      rs.filter(_._3 == 0L).map(r => r._1 -> r._2).toMap
    assert(startBins(other) != startBins(rows),
      "epoch 4 must permute the corpus differently than epoch 3")
  }

  test("packRowsSemanticOf: cluster-grouped fold in (list, id) order, tiling") {
    import graft.queries.CurationQueries
    // seeded centroids are the two smallest-id vectors VERBATIM (no
    // Lloyd iteration); every other vector equals one of them exactly,
    // so cluster membership is analytic: docs 0,3,5 -> centroid 1
    // (ex-doc0's direction), docs 1,2,4 -> centroid 2
    val a = Seq(1.0f, 0f, 0f, 0f); val b = Seq(0f, 1f, 0f, 0f)
    val emb = Seq((0L, a), (1L, b), (2L, b), (3L, a), (4L, b), (5L, a))
      .toDF("vec_id", "embedding")
    val sizes = Map(0L -> 3, 1L -> 5, 2L -> 7, 3L -> 11, 4L -> 13, 5L -> 17)
    val docs = sizes.toSeq.sortBy(_._1).map { case (id, n) =>
      (id, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = CurationQueries
      .packRowsSemanticOf(docs, emb, seqLen = 16, nlist = 2, idWidth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // hand fold: cluster 1 ids ascending (0, 3, 5), then cluster 2
    // (1, 2, 4)
    val order = Seq(0L, 3L, 5L, 1L, 2L, 4L)
    var cum = 0L
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for (id <- order) {
      val n = sizes(id)
      var bn = cum / 16
      while (bn * 16 < cum + n) {
        want += ((id, bn, math.max(cum, bn * 16) - cum,
          math.min(cum + n, (bn + 1) * 16) - cum))
        bn += 1
      }
      cum += n
    }
    assert(rows.sortBy(r => (r._1, r._2)).toSeq ==
      want.sortBy(r => (r._1, r._2)).toSeq,
      s"semantic slices must equal the cluster-grouped fold: got ${rows.toSeq}")
    // tiling invariant survives: full windows hold exactly seqLen
    val total = sizes.values.map(_.toLong).sum
    val byBin = rows.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    for (bn <- 0L until (total - 1) / 16)
      assert(byBin(bn) == 16L, s"bin $bn holds ${byBin(bn)} tokens")
  }

  test("packRowsCurriculumOf: easy-first fold in (xent, id) order, tie-break, tiling") {
    import graft.queries.CurationQueries
    // each doc is ONE unique token repeated n times: tc = n, so
    // xent = -ln(n/total) — bigger docs are analytically EASIER, and
    // docs 1 and 3 tie exactly (same n) to exercise the id tie-break
    val sizes = Seq(0L -> 50, 1L -> 10, 2L -> 30, 3L -> 10)
    val docs = sizes.map { case (id, n) =>
      (id, Seq.fill(n)(s"t$id").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = CurationQueries.packRowsCurriculumOf(docs, seqLen = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // hand fold in (-ln(n/total) asc → n desc, id asc) order:
    // doc0 (n=50), doc2 (30), doc1 (10), doc3 (10)
    val order = Seq(0L -> 50, 2L -> 30, 1L -> 10, 3L -> 10)
    var cum = 0L
    val want = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    for ((id, n) <- order) {
      var b = cum / 64
      while (b * 64 < cum + n) {
        want += ((id, b, math.max(cum, b * 64) - cum,
          math.min(cum + n, (b + 1) * 64) - cum))
        b += 1
      }
      cum += n
    }
    assert(rows.sortBy(r => (r._1, r._2)).toSeq ==
      want.sortBy(r => (r._1, r._2)).toSeq,
      s"curriculum slices must equal the easy-first sequential fold: got ${rows.toSeq}")
    // the easiest doc opens window 0; the hardest-tied pair closes the
    // corpus in id order
    assert(rows.filter(r => r._2 == 0 && r._3 == 0).map(_._1).min == 0L)
    val byBin = rows.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    for (b <- 0L until (100L - 1) / 64)
      assert(byBin(b) == 64L, s"bin $b holds ${byBin(b)} tokens")
  }

  test("packRowsOf EOD accounting and packSourcesOf provenance reconcile") {
    import graft.queries.CurationQueries
    import graft.functions.{TextAnalysis => TA}
    val sizes = Seq((0L, "a", 5), (1L, "a", 2000), (2L, "b", 100),
      (63L, "b", 3000), (64L, "a", 10))
    val docs = sizes.map { case (id, src, n) =>
      (id, src, (0 until n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    // EOD: every doc's slices now sum to n+1 — the separator spends
    // budget like a token — and full windows still tile at seqLen
    val eod = CurationQueries.packRowsOf(docs, seqLen = 1024, chunkWidth = 64,
        nTok = TA.tokenCount(col("text")) + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perDoc = eod.groupBy(_._1).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    for ((id, _, n) <- sizes)
      assert(perDoc(id) == n + 1L, s"doc $id must pack n+1 slots, got ${perDoc(id)}")
    val total = sizes.map(_._3.toLong + 1).sum
    val byBin = eod.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    for (b <- 0L until (total - 1) / 1024)
      assert(byBin(b) == 1024L, s"bin $b holds ${byBin(b)} slots")
    // provenance: per-bin source rows sum back to the window totals,
    // per-source totals equal the source's document mass
    val prov = CurationQueries.packSourcesOf(docs, seqLen = 1024, chunkWidth = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val rows = CurationQueries.packRowsOf(docs, seqLen = 1024, chunkWidth = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val wantBin = rows.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    assert(prov.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap == wantBin,
      "per-window provenance must sum to the window totals")
    val bySrc = prov.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(bySrc == Map("a" -> (5L + 2000 + 10), "b" -> (100L + 3000)),
      s"per-source provenance mass: $bySrc")
    assert(prov.map(_._3).sum == rows.length.toLong,
      "provenance slice counts must cover every slice once")
  }

  test("postingsOf: true df with a bounded sorted min-k preview") {
    import graft.queries.PipelineQueries
    // 20 docs share token "common"; each has a unique token too
    val docs = (0 until 20).map(i => (100L - i, s"common uniq$i common"))
      .toDF("doc_id", "text")
    val rows = PipelineQueries.postingsOf(docs, cap = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val (df, post) = rows("common")
    assert(df == 20L, "per-doc duplicate token must count once")
    // preview: the 16 SMALLEST ids ascending, capped below the true df
    assert(post == (81L to 96L).mkString(","), post)
    assert(rows("uniq3") == ((1L, "97")))
  }

  test("postings index merges shard-wise: merge(index(A), index(B)) == index(A u B)") {
    import graft.queries.PipelineQueries._
    // disjoint doc-id shards sharing some tokens; cap 4 forces real
    // preview merging (union previews exceed the cap on shared tokens)
    val a = (0L until 8L).map(i => (i, s"shared a$i both")).toDF("doc_id", "text")
    val b = (100L until 106L).map(i => (i, s"shared b$i")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2).toList)).toSet
    val merged = rows(mergePostings(
      postingsIndexOf(a, cap = 4), postingsIndexOf(b, cap = 4), cap = 4))
    val direct = rows(postingsIndexOf(a.unionByName(b), cap = 4))
    assert(merged == direct, s"merged=$merged\ndirect=$direct")
    // spot checks: shared token's df spans shards, preview is the 4
    // smallest union ids; one-sided tokens pass through untouched
    assert(merged.contains(("shared", 14L, List(0L, 1L, 2L, 3L))))
    assert(merged.contains(("both", 8L, List(0L, 1L, 2L, 3L))))
    assert(merged.contains(("b101", 1L, List(101L))))
  }
}
