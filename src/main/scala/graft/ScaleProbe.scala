package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity}
import graft.operators.Ewma

/** Scale validation probe (evidence for docs/SCALE.md): replicates the
  * fixture corpus N× with perturbed ids/content and times the pair-space
  * operators, verifying cost grows ~linearly with corpus size (bucketed
  * candidate generation), not quadratically; also runs the exact EWM fold
  * over a single 200k-row key (beyond the closed-form comfort zone).
  * `sbt "runMain graft.ScaleProbe [factor]"`.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // probe protocol: clear ALL caches (the pair operators cache
    // shingle/signature intermediates internally), re-materialize the
    // input corpus cache via `prep`, THEN time the operator — so each
    // number is operator cost with a warm input and cold operator state
    def probe[T](name: String)(prep: => Unit)(f: => T): T = {
      spark.catalog.clearCache()
      prep
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    val nBase = base.count()
    // replicate with distinct ids and a per-copy token prefix. NOTE: the
    // prefix only perturbs the leading shingles, so the 20 copies of each
    // base doc REMAIN near-duplicates — the pair space carries ~190 true
    // near-dup pairs per base doc (~1M pairs at factor 20), making this a
    // worst-case dedup stress, not a disjoint-corpus one
    val big = base.crossJoin(spark.range(factor).toDF("copy"))
      .select(
        (col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(lit("c"), col("copy"), lit(" "), col("text")).as("text"))
      .repartition(16).cache()
    val nBig = big.count()
    println(s"[scale] corpus: $nBase -> $nBig docs")

    def warmBig(): Unit = { big.cache(); big.count() }

    probe(s"minhash_pairs @${nBase}")(())(
      Dedup.minhashPairs(base.select("doc_id", "text"), "doc_id", "text").count())
    probe(s"minhash_pairs @${nBig}")(warmBig())(
      Dedup.minhashPairs(big, "doc_id", "text").count())
    probe(s"jaccard_pairs @${nBase}")(())(
      Dedup.jaccardPairs(base.select("doc_id", "text"), "doc_id", "text", 5).count())
    probe(s"jaccard_pairs @${nBig}")(warmBig())(
      Dedup.jaccardPairs(big, "doc_id", "text", 5).count())
    probe(s"simhash @${nBig}")(warmBig())(
      Dedup.simhash(big, "doc_id", "text").count())
    // pairs → groups over the ~1M-near-dup-pair stress corpus. At ~2M
    // symmetric edges this sits at/below CcDriverMaxEdges, so dedupGroups
    // measures pair gen + the DRIVER union-find fast path; the
    // distributed label-propagation rounds are probed separately below
    // (driverMaxEdges = 0 forces them on the same pair set).
    probe(s"dedup_groups @${nBase}")(())(
      Dedup.dedupGroups(base.select("doc_id", "text"), "doc_id", "text").count())
    probe(s"dedup_groups @${nBig}")(warmBig())(
      Dedup.dedupGroups(big, "doc_id", "text").count())
    probe(s"cc_distributed @${nBig}")(warmBig())(
      Dedup.connectedComponents(Dedup.minhashPairs(big, "doc_id", "text"),
        pairsDistinct = true, driverMaxEdges = 0).count())
    // large-star/small-star on the SAME ~1M-pair set: worst-case-shape
    // insurance should cost the same order as min-label here (near-dup
    // cliques converge in 2-3 rounds under either algorithm)
    probe(s"cc_star @${nBig}")(warmBig())(
      Dedup.connectedComponentsStar(
        Dedup.minhashPairs(big, "doc_id", "text")).count())
    // production convergence (monotone fingerprint + one final except):
    // same output (DedupSpec pins it), ~one job/round cheaper
    probe(s"cc_star_prod @${nBig}")(warmBig())(
      Dedup.connectedComponentsStar(
        Dedup.minhashPairs(big, "doc_id", "text"),
        exactConvergence = false).count())
    // spill-safe pair expansion: same collision pair space through the
    // sort-merge self-join (two signature-pipeline sides instead of one
    // agg — the expected ~2× shows up here, not super-linear growth)
    probe(s"minhash_join @${nBase}")(())(
      Dedup.minhashPairsJoin(base.select("doc_id", "text"), "doc_id", "text").count())
    probe(s"minhash_join @${nBig}")(warmBig())(
      Dedup.minhashPairsJoin(big, "doc_id", "text").count())
    // KMV distinct-shingle sketch: bounded buffers -> scan-speed growth.
    // head(), NOT count(): under count() Catalyst prunes the unreferenced
    // aggregate expression and the probe would time an empty shell (the
    // same pruning Bench's noop action exists to defeat)
    probe(s"kmv_distinct @${nBig}")(warmBig())(
      Dedup.shinglesRaw(big, "doc_id", "text", 5)
        .select(graft.functions.Sketches.kMinValues(
          Dedup.md5Hash60(col("shingle")), 256).as("kept"))
        .head())
    // curation layer at the replicated corpus: decontamination's cost is
    // the shingle pipeline (broadcast probe adds nothing super-linear),
    // token-budget is two windows + a tiny broadcast, chunking is
    // scan-speed fan-out (noop-materialized so the slice/concat isn't
    // pruned away — the Bench action lesson)
    // incremental dedup: seen-side distinct fingerprints (narrow md5
    // strings) + one anti-join — expected scan-speed at any split
    probe(s"dedup_incr @${nBig}")(warmBig())(
      Dedup.dedupNewRows(
        big.where(col("doc_id") % 3 =!= 0),
        big.where(col("doc_id") % 3 === 0), "doc_id", "text").count())
    // groups → best-member retention: pair gen + CC dominate; the
    // quality argmax adds one window over the member set only
    probe(s"dedup_best @${nBig}")(warmBig())(
      graft.queries.PipelineQueries.dedupBestOf(big).count())
    // per-language top-p through the decomposed percent_rank: parallel
    // across (lang × quality-bucket) partitions regardless of skew
    probe(s"quality_topp @${nBig}")(warmBig())(
      graft.queries.CurationQueries.qualityTopPOf(
        big.withColumn("lang", concat(lit("l"), col("doc_id") % 3))).count())
    probe(s"decontaminate @${nBig}")(warmBig())(
      graft.queries.CurationQueries.decontaminateOf(big).count())
    // the production two-input shape: bench side broadcast, no corpus
    // cache — should track the single-corpus twin (the shingle pipeline
    // dominates both)
    probe(s"decontaminate_x @${nBig}")(warmBig())(
      graft.queries.CurationQueries.decontaminateAgainst(
        big.where(col("doc_id") % 16 =!= 15),
        big.where(col("doc_id") % 16 === 15)).count())
    probe(s"token_budget @${nBig}")(warmBig())(
      graft.queries.CurationQueries.tokenBudgetOf(big, 60000L * factor).count())
    probe(s"chunks @${nBig}")(warmBig())(
      Bench.materialize(graft.queries.CurationQueries.chunksOf(big)))
    // corpus-statistics scoring: one vocab shuffle + one doc aggregation
    // — expected ~linear in corpus tokens
    probe(s"unigram_xent @${nBig}")(warmBig())(
      Bench.materialize(graft.functions.TextAnalysis.unigramXent(big, "doc_id", "text")))
    probe(s"cdc_chunks @${nBig}")(warmBig())(
      Bench.materialize(graft.queries.CurationQueries.cdcChunksOf(big)))

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val bigEmb = emb.crossJoin(spark.range(factor).toDF("copy"))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"), col("embedding"))
    def warmEmb(): Unit = { bigEmb.cache(); bigEmb.count() }
    warmEmb()
    println(s"[scale] embeddings: ${bigEmb.count()} vectors")
    probe("brute_topk @40k")(warmEmb())(
      Similarity.bruteForceTopK(bigEmb, "vec_id", "embedding", 0L, 10).count())
    probe("lsh_topk @40k")(warmEmb())(
      Similarity.lshTopK(bigEmb, "vec_id", "embedding", 0L, 10).count())
    // SemDeDup at 40k vectors with nlist SCALED to the corpus (256 →
    // ~160-wide clusters): the cluster-local pair space stays ~Σ|c|²,
    // the knob the operator's scale story depends on
    probe("semdedup @40k nlist=256")(warmEmb())(
      Similarity.semDedup(bigEmb, "vec_id", "embedding", nlist = 256).count())
    // BATCH retrieval at 20× the corpus: 100 queries × nprobe lists
    // broadcast against the 40k-vector corpus — candidates ≈
    // nprobe/nlist of the corpus per query, top-k shuffle sized by
    // candidates, never the corpus. nlist scales with the corpus (256)
    // so the per-list fan-out stays ~160 vectors.
    probe("ann_join 100q @40k nlist=256")(warmEmb())(
      Similarity.annJoin(bigEmb, bigEmb.where(col("vec_id") < 100),
        "vec_id", "embedding", 10, nlist = 256, nprobe = 8).count())
    // the cross-modal composition (q_pipeline_semantic shape) at the
    // replicated corpora: embedding-side drops anti-joined into the
    // document-side quality gate — only doc_id keys cross modalities.
    // doc_id and vec_id replicas share the id transform, so the join
    // keys align as in the fixture.
    probe(s"pipeline_semantic @${nBig}")({ warmBig(); warmEmb() })(
      graft.queries.CurationQueries.pipelineSemanticOf(
        big, bigEmb, nlist = 256).count())

    // k-means iteration growth: driver-sequenced Lloyd's must be LINEAR
    // in iters (flat lineage — one job per round); a lineage-chained
    // implementation re-executes rounds 1..i-1 inside round i and grows
    // quadratically. Measured ratio should sit near 10/3, not (10/3)².
    def kmeansTimed(iters: Int): Double = {
      warmEmb()
      val t0 = System.nanoTime()
      Similarity.kmeansLocalCentroids(bigEmb, "vec_id", "embedding", 16, iters)
      (System.nanoTime() - t0) / 1e9
    }
    val k3 = kmeansTimed(3)
    val k10 = kmeansTimed(10)
    println(f"[scale] kmeans @40k iters=3 ${k3}%.2f s, iters=10 ${k10}%.2f s, " +
      f"ratio ${k10 / k3}%.1f (linear ~3.3, quadratic ~11)")

    // ---- streaming near-dup gate: bucketed state probes ---------------
    // Seed three gate states — 5k docs, 100k docs (bucketed at 1024),
    // and 100k docs at buckets=1 (the flat-scan twin: SAME code, bucket
    // pruning off — the r5 full-table-probe shape). Then time ONE small
    // probe batch (4 docs ≈ 66 touched band buckets of 1024) against
    // each: the bucketed 20× probe must cost a FRACTION of the flat 20×
    // probe, and reshard keeps that fraction as the state grows.
    import graft.streaming.{LakeMaintenance, NearDupGate}
    val tmp = java.nio.file.Files.createTempDirectory("gate-scale").toString
    val GateBuckets = 1024
    def gDir(n: String) = (s"$tmp/$n/out", s"$tmp/$n/state")
    // UNTIMED write-path warmup (the Bench warmup philosophy): nothing
    // earlier in this probe writes parquet, and a first 1024-dir
    // dynamic-partition write pays parquet-writer/committer JIT across
    // thousands of file opens — measured ~17 s of pure first-run cost
    // that would otherwise be charged to whichever seed runs first. The
    // warmup is a full-size seed into a throwaway dir so the timed
    // seeds below measure steady-state write cost.
    locally {
      val (o, s) = gDir("warm")
      NearDupGate.curateBatch(base.select("doc_id", "text"), o, s,
        buckets = GateBuckets)
    }
    probe(s"gate_seed @${nBase} b$GateBuckets")(()) {
      val (o, s) = gDir("s1")
      NearDupGate.curateBatch(base.select("doc_id", "text"), o, s,
        buckets = GateBuckets)
    }
    probe(s"gate_seed @${nBig} b$GateBuckets")(warmBig()) {
      val (o, s) = gDir("s20")
      NearDupGate.curateBatch(big, o, s, buckets = GateBuckets)
    }
    probe(s"gate_seed @${nBig} flat")(warmBig()) {
      val (o, s) = gDir("f20")
      NearDupGate.curateBatch(big, o, s, buckets = 1)
    }
    def gateProbeBatch(tag: String) =
      (0 until 4).map(i => ((1L << 40) + i,
        (0 until 80).map(j => s"$tag${i}q$j").mkString(" ")))
        .toDF("doc_id", "text")
    probe(s"gate_probe @${nBase} b$GateBuckets")(()) {
      val (o, s) = gDir("s1")
      NearDupGate.curateBatch(gateProbeBatch("a"), o, s, buckets = GateBuckets)
    }
    probe(s"gate_probe @${nBig} b$GateBuckets")(()) {
      val (o, s) = gDir("s20")
      NearDupGate.curateBatch(gateProbeBatch("b"), o, s, buckets = GateBuckets)
    }
    probe(s"gate_probe @${nBig} flat")(()) {
      val (o, s) = gDir("f20")
      NearDupGate.curateBatch(gateProbeBatch("c"), o, s, buckets = 1)
    }
    // ---- 10k-doc batch: the verified-drop sig fetch at volume ---------
    // (r6 item 7) — half the batch near-dups the seeded state (prefix
    // perturbation, the corpus note above), so the state-collision →
    // signature-fetch → est-verify path does real work; half is fresh.
    // Sub-linearity evidence: the SAME batch shape against 1× and 20×
    // state — wall-clock must grow far slower than the 20× state ratio
    // (each batch reads only its own collision set's buckets/rows).
    def tenK(tag: String, idBase: Long) = {
      val near = big.limit(5000).select(
        (lit(idBase) + col("doc_id")).as("doc_id"),
        concat(lit(s"$tag "), col("text")).as("text"))
      val fresh = spark.range(5000).select(
        (lit(idBase * 2) + col("id")).as("doc_id"),
        concat_ws(" ", (0 until 80).map(j =>
          concat(lit(s"$tag${j}x"), col("id"))): _*).as("text"))
      near.unionByName(fresh).repartition(16)
    }
    val adm1 = probe(s"gate_probe 10k docs @${nBase} b$GateBuckets")(()) {
      val (o, s) = gDir("s1")
      NearDupGate.curateBatch(tenK("p", 1L << 41), o, s, buckets = GateBuckets)
    }
    val adm20 = probe(s"gate_probe 10k docs @${nBig} b$GateBuckets")(()) {
      val (o, s) = gDir("s20")
      NearDupGate.curateBatch(tenK("q", 1L << 43), o, s, buckets = GateBuckets)
    }
    println(s"[scale] gate 10k-doc admits: $adm1 @1x, $adm20 @20x " +
      "(near-half dropped via est-verified state collisions)")
    // ---- cost decomposition: state-cost vs batch-cost (r7 item 8) -----
    // The same 10k-doc batch against an EMPTY state isolates the
    // BATCH-side cost (signature pipelines + batch-local CC +
    // registration writes — everything that depends only on the batch);
    // the @1x/@20x runs above add the STATE-side cost (leaf probes +
    // collision sig fetches + est-verify). state share = measured −
    // empty-state baseline, and it tracks the batch's COLLISION SET,
    // not |state|.
    val admE = probe(s"gate_probe 10k docs @empty state")(()) {
      val (o, s) = gDir("empty")
      NearDupGate.curateBatch(tenK("r", 1L << 45), o, s, buckets = GateBuckets)
    }
    println(s"[scale] gate 10k-doc decomposition baseline admits: $admE " +
      "(no state: every component minimum admits)")
    // ---- maintenance window: ONE leaf split, cost ~ leaf bytes --------
    // (r7 headline) — the incremental reshard's pause is one leaf's
    // rewrite (~ state/1024 here), never O(|state|); the probe after it
    // shows the mixed trie still bucket-prunes.
    probe(s"gate_split_leaf @${nBig} (maintenance window)")(()) {
      val (o, s) = gDir("s20")
      NearDupGate.splitLargestLeaf(spark, o, s, targetBytes = 1L)
    }
    probe(s"gate_probe post-split @${nBig}")(()) {
      val (o, s) = gDir("s20")
      NearDupGate.curateBatch(gateProbeBatch("d"), o, s, buckets = GateBuckets)
    }
    // The SCALE-relevant probe metric is BYTES TOUCHED, not local[16]
    // wall-clock (at 1.6M state rows job overhead dominates the timing
    // above): the fraction of state a probe batch reads is
    // touched-buckets/total, and it holds at ANY state size because the
    // bucket is a pure hash of the probe key. Recomputed here from the
    // public pipeline (same expressions the gate uses).
    locally {
      val pb = gateProbeBatch("m")
      val touched = Dedup.signatureBands(
          Dedup.minhashSignatures(
            Dedup.shinglesRaw(pb, "doc_id", "text", 5), 64), 64, 16)
        .select(pmod(col("band_hash"), lit(GateBuckets.toLong)).cast("int").as("b"))
        .distinct().as[Int].collect().toSet
      val (_, statePath) = gDir("s20")
      val root = new org.apache.hadoop.fs.Path(s"$statePath/bands")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dirs = fs.listStatus(root).filter(_.isDirectory)
      def bytes(ds: Seq[org.apache.hadoop.fs.FileStatus]): Long =
        ds.map(d => fs.listStatus(d.getPath).filter(_.isFile).map(_.getLen).sum).sum
      val total = bytes(dirs.toSeq)
      val hit = bytes(dirs.filter(d =>
        touched.contains(d.getPath.getName.stripPrefix("bucket=").toInt)).toSeq)
      println(f"[scale] gate probe touches ${touched.size}/$GateBuckets band " +
        f"buckets = ${100.0 * hit / total}%.1f%% of state bytes " +
        "(state-size-independent: the bucket is a pure key hash)")
    }
    // ---- hot-band mitigation: per-batch cost flat under a flood -------
    // (r8 item) The leaf shape splitLargestLeaf refuses: a boilerplate
    // template floods a fixed 16-band key set, so every colliding batch
    // fetches the keys' ENTIRE membership (grows with every prior flood
    // batch) and est-verifies against it. After mitigateHotBands mines
    // the (diverse-membership) keys into the drop list, the same batch
    // shape neither probes nor regrows them — per-batch cost drops to
    // the batch's own work and stays flat no matter how many floods
    // came before. Bucket count is small here: trie fan-out is
    // irrelevant to a hot KEY (all rows share one hash).
    locally {
      val (o, s) = gDir("hot")
      val common = (0 until 200).map(i => s"hb$i").mkString(" ")
      def flood(idBase: Long, n: Int) =
        spark.range(n).select((lit(idBase) + col("id")).as("doc_id"),
          concat(lit(common + " u"),
            (col("id") + lit(idBase)).cast("string")).as("text"))
      (0 until 10).foreach { i =>
        NearDupGate.curateBatch(flood(i * 1000L, 500), o, s, buckets = 64)
      }
      probe(s"gate_flood_batch pre-mitigation (5k-member keys)")(()) {
        NearDupGate.curateBatch(flood(1L << 30, 500), o, s, buckets = 64)
      }
      val minedHot = probe("gate_mitigate_hot_bands (maintenance)")(()) {
        NearDupGate.mitigateHotBands(spark, o, s,
          targetBytes = 1L, maxBandMembers = 256L)
      }
      probe("gate_flood_batch post-mitigation")(()) {
        NearDupGate.curateBatch(flood(2L << 30, 500), o, s, buckets = 64)
      }
      probe("gate_flood_batch post-mitigation 2")(()) {
        NearDupGate.curateBatch(flood(3L << 30, 500), o, s, buckets = 64)
      }
      println(s"[scale] hot-band mitigation mined ${minedHot.size} diverse " +
        "band key(s); post-mitigation flood batches do not regrow them")
    }

    // ---- streaming SEMANTIC gate: list-pruned embedding state probes --
    // Seed the embedding gate with the 40k-vector corpus (nlist=256,
    // trained from the seed batch and persisted), then time ONE
    // 10-vector probe batch: it reads only its routed nprobe=8 lists —
    // the same batch-cost-not-state-cost contract as the text gate, in
    // embedding space, with the bytes fraction ≈ nprobe/nlist by
    // construction.
    locally {
      import graft.streaming.SemDeDupGate
      val (o, s2) = (s"$tmp/semgate/out", s"$tmp/semgate/state")
      val vb = bigEmb.select(col("vec_id").as("vid"), col("embedding").as("v"))
      probe("semgate_seed @40k nlist=256")(warmEmb()) {
        SemDeDupGate.curateBatch(vb, o, s2, minCos = 0.95,
          nlist = 256, nprobe = 8)
      }
      val pb = bigEmb.orderBy("vec_id").limit(10)
        .select((col("vec_id") + lit(1L << 40)).as("vid"),
          col("embedding").as("v"))
      val adm = probe("semgate_probe 10 vecs @40k")(()) {
        SemDeDupGate.curateBatch(pb, o, s2, minCos = 0.95,
          nlist = 256, nprobe = 8)
      }
      // exact copies under fresh ids: every one must drop via state
      println(s"[scale] semgate probe admits: $adm of 10 exact copies " +
        "(0 expected — all drop against the seeded state)")
      // the scale-honest metric, as for the text gate: bytes touched
      val root = new org.apache.hadoop.fs.Path(s"$s2/vecs")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dirs = fs.listStatus(root).filter(_.isDirectory)
      def bytesOf(ds: Seq[org.apache.hadoop.fs.FileStatus]): Long =
        ds.map(d => fs.listStatus(d.getPath).filter(_.isFile).map(_.getLen).sum).sum
      val coarse = spark.read.parquet(s"$s2/_centroids").collect()
        .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
      val touched = Similarity.routeQueries(
          pb.select(col("vid").as("qid"),
            transform(col("v"), _.cast("double")).as("qv")), coarse, 8)
        .select("list").distinct().as[Int].collect().toSet
      val total = bytesOf(dirs.toSeq)
      val hit = bytesOf(dirs.filter(d =>
        touched.contains(d.getPath.getName.stripPrefix("list=").toInt)).toSeq)
      println(f"[scale] semgate probe touches ${touched.size}/256 lists = " +
        f"${100.0 * hit / total}%.1f%% of state bytes")
    }

    // ---- embedding-gate compaction: measured, not asserted ------------
    // (r9 item 7) One-file-per-batch accretion in the list dirs, then
    // the gate's own fenced compaction: before/after file counts and
    // the SAME probe batch timed against each layout.
    locally {
      import graft.streaming.SemDeDupGate
      val (o, s) = (s"$tmp/semgate-compact/out", s"$tmp/semgate-compact/state")
      val all = bigEmb.orderBy("vec_id").limit(4000)
        .select(col("vec_id").as("vid"), col("embedding").as("v")).cache()
      all.count()
      (0 until 16).foreach { i =>
        SemDeDupGate.curateBatch(all.where(pmod(col("vid"), lit(16)) === i),
          o, s, minCos = 0.95, nlist = 64, nprobe = 4)
      }
      val root = new org.apache.hadoop.fs.Path(s"$s/vecs")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def stateFiles(): Int = fs.listStatus(root).filter(_.isDirectory)
        .map(d => fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))).sum
      val pb = bigEmb.orderBy("vec_id").limit(10)
        .select((col("vec_id") + lit(1L << 41)).as("vid"),
          col("embedding").as("v"))
      val filesBefore = stateFiles()
      probe("semgate_probe pre-compaction")(())(
        SemDeDupGate.curateBatch(pb, o, s, minCos = 0.95,
          nlist = 64, nprobe = 4))
      probe("semgate_compact (maintenance)")(())(
        SemDeDupGate.compactState(spark, o, s, maxFiles = 2))
      val filesAfter = stateFiles()
      probe("semgate_probe post-compaction")(())(
        SemDeDupGate.curateBatch(
          pb.select((col("vid") + 10L).as("vid"), col("v")), o, s,
          minCos = 0.95, nlist = 64, nprobe = 4))
      println(s"[scale] semgate compaction: state files $filesBefore -> " +
        s"$filesAfter (probe opens track file count, rows unchanged)")
      all.unpersist()
    }

    // ---- embedding-gate FLOOD: survivors-only keeps state flat --------
    // (r10 verdict item 1, the last `weak`) A sustained one-tight-
    // cluster stream is the shape splitList provably cannot mitigate
    // (sub-centroids cannot separate near-identical vectors — the r10
    // probe measured 5.1 of 5.4 MB left in the top-2 sub-lists).
    // Register-all grew the hot list by |batch| rows per batch forever,
    // and every later probe scanned the whole flood; survivors-only
    // registration keeps batch 0's representatives and NOTHING after:
    // state bytes and per-batch wall time are flat at ANY flood length.
    locally {
      import graft.streaming.SemDeDupGate
      val (o, s) = (s"$tmp/semgate-flood/out", s"$tmp/semgate-flood/state")
      val fdim = 64
      // near-identical members of one semantic cluster: the all-ones
      // direction with a deterministic per-id 1e-4 jitter (pairwise
      // cosine > 0.9999 — far above minCos)
      def flood(idBase: Long, n: Int) =
        spark.range(n).select((lit(idBase) + col("id")).as("vid"),
          transform(sequence(lit(1), lit(fdim)), j =>
            lit(1.0) + ((col("id") + lit(idBase)) * 31 + j.cast("long")) % 101
              * lit(1e-4)).as("v"))
      def stateBytes(): Long = {
        val root = new org.apache.hadoop.fs.Path(s"$s/vecs")
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(root)) 0L
        else fs.listStatus(root).filter(_.isDirectory)
          .map(d => fs.listStatus(d.getPath)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .map(_.getLen).sum).sum
      }
      val sizes = (0 until 8).map { b =>
        probe(s"semgate_flood batch $b (2k vecs)")(()) {
          SemDeDupGate.curateBatch(flood(b * 2000L, 2000), o, s,
            minCos = 0.9, nlist = 16, nprobe = 4)
        }
        stateBytes()
      }
      require(sizes.tail.forall(_ == sizes.head),
        s"flood grew embedding-gate state: $sizes")
      println(s"[scale] semgate flood: state bytes FLAT at ${sizes.head} " +
        "across 8 consecutive one-cluster flood batches (register-all " +
        "grew ~2k rows/batch, probes paid the whole flood)")
    }

    // ---- snapshot retention: _stale accretion bounded by vacuum -------
    // (r10 verdict item 5) Under the append-retire discipline every
    // compaction's replaced files move to `_stale/v<N>` instead of
    // being deleted, so a long-lived gate accretes retired bytes
    // without bound unless vacuum runs. Measured: a 24-batch stream
    // with compaction every 6 batches, then Snapshot.vacuum at a
    // keep=2 floor — files/bytes before vs after, with a reader pinned
    // AT the retention floor proven bit-stable across the vacuum.
    locally {
      import graft.streaming.{SemDeDupGate, Snapshot}
      val (o, s) = (s"$tmp/semgate-vac/out", s"$tmp/semgate-vac/state")
      SemDeDupGate.initSnapshots(spark, o, s)
      // DISTINCT pseudo-random vectors (64-dim, xxhash64-derived — a
      // LINEAR lattice like (a·id + b·j) mod m is NOT usable here: its
      // vectors are correlated sawtooths with pairwise cosines far
      // above any threshold): pairwise cosines concentrate near 0, so
      // every batch ADMITS and the state keeps appending + committing —
      // the accretion shape retention exists for (near-dup floods are
      // the FLOOD probe's job)
      def distinctBatch(idBase: Long, n: Int) = {
        val vid = lit(idBase) + col("id")
        spark.range(n).select(vid.as("vid"),
          transform(sequence(lit(1), lit(64)), j =>
            (xxhash64(vid, j) % 1000).cast("double")).as("v"))
      }
      (0 until 24).foreach { i =>
        SemDeDupGate.curateBatch(distinctBatch(i * 100L, 100),
          o, s, minCos = 0.95, nlist = 8, nprobe = 4)
        if (i % 6 == 5) SemDeDupGate.compactState(spark, o, s, maxFiles = 2)
      }
      def du(p: String): (Long, Long) = {
        val root = new org.apache.hadoop.fs.Path(p)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        var files = 0L; var bytes = 0L
        val it = fs.listFiles(root, true)
        while (it.hasNext) { val f = it.next(); files += 1; bytes += f.getLen }
        (files, bytes)
      }
      val vecsRoot = s"$s/vecs"
      val latest = Snapshot.latestVersion(spark, vecsRoot).get
      val keep = 2
      val floor = latest - keep + 1
      def pinnedRows(): Long = Snapshot.readVersion(spark, vecsRoot,
        Some(floor), Seq("list")).get.count()
      val pinnedBefore = pinnedRows()
      val before = du(vecsRoot)
      val (mv, sv) = probe("semgate_vacuum keep=2")(())(
        Snapshot.vacuum(spark, vecsRoot, keep))
      val after = du(vecsRoot)
      require(pinnedRows() == pinnedBefore,
        "vacuum broke the retention-floor pinned reader")
      require(after._2 <= before._2 && after._1 <= before._1,
        s"vacuum grew the state dir: $before -> $after")
      println(s"[scale] semgate vacuum: state files ${before._1} -> " +
        s"${after._1}, bytes ${before._2} -> ${after._2} " +
        s"($mv manifests, $sv stale trees removed); reader pinned at " +
        s"retention floor v$floor stable at $pinnedBefore rows")
    }

    // ---- compaction cost tracks the partition's file count ------------
    val f10 = s"$tmp/files10"; val f200 = s"$tmp/files200"
    spark.range(100000).repartition(10).write.parquet(f10)
    spark.range(100000).repartition(200).write.parquet(f200)
    probe("compact_flat 10 files")(())(
      LakeMaintenance.compactFlat(spark, f10, maxFiles = 1))
    probe("compact_flat 200 files")(())(
      LakeMaintenance.compactFlat(spark, f200, maxFiles = 1))

    // exact EWM over one 200k-row key — far beyond the closed-form
    // double-range limit; must stream in O(1) state. The action is
    // INSIDE the timer (perRow alone only builds a plan)
    val series = spark.range(200000).select(
      lit("K").as("sym"), col("id").as("t"),
      (sin(col("id") / 100.0) * 50 + 100).as("close"))
    val ema = Ewma.perRow(series, "close", 25, Seq("sym"), Seq("t"))
    probe("ewma_perRow @200k single key")(())(ema.count())
    val last = ema.orderBy(col("t").desc).select("ema_exact").head().getDouble(0)
    println(s"[scale] ewma final=$last (finite=${!last.isNaN && !last.isInfinite})")

    // segmented-scan EWM on ONE 8M-row key — PAST EwmaAgg's enforced
    // 2^22 buffer bound (which would throw here): two bounded
    // aggregations, each buffering at most chunkWidth rows / chunk
    // count. Cross-checked against the O(1)-state sequential fold.
    val longSeries = spark.range(8000000).select(
      lit("K").as("sym"), col("id").as("t"),
      (sin(col("id") / 100.0) * 50 + 100).as("close"))
    val segFinal = probe("ewma_segmented @8M single key")(()) {
      Ewma.emaSegmented(longSeries, "close", 25, Seq("sym"), "t")
        .head().getDouble(1)
    }
    val foldFinal = Ewma.perRow(longSeries, "close", 25, Seq("sym"), Seq("t"))
      .orderBy(col("t").desc).select("ema_exact").head().getDouble(0)
    println(f"[scale] ewma_segmented final=$segFinal vs fold=$foldFinal " +
      f"(rel err ${math.abs(segFinal - foldFinal) / math.abs(foldFinal)}%.2e)")

    annSelfSweep(spark)
    spark.stop()
  }

  /** CORPUS-SELF-SWEEP batch ANN join (the r9 weak boundary, closed by
    * the size-gated shuffled fallback): the corpus queries ITSELF —
    * the routed query side is corpus-scale, far past any broadcast
    * budget, so [[Similarity.annJoin]] shifts to the list-partitioned
    * sort-merge candidate join. Records wall time AND actual shuffle
    * bytes (a broadcast here would have to ship
    * routed-bytes × executors and build it in every task's memory).
    * Synthetic deterministic vectors (diverse directions — replicating
    * fixture rows would collapse the seeded centroids into duplicate
    * lists). Runs standalone via [[AnnSweepProbe]]. */
  def annSelfSweep(spark: SparkSession, n: Long = 100000L,
                   nlist: Int = 512, nprobe: Int = 4): Unit = {
    val dim = 64
    val sweep = spark.range(n).toDF("vec_id")
      .select(col("vec_id"), transform(sequence(lit(1), lit(dim)),
        j => sin(col("vec_id") * j.cast("double") * 0.7321)).as("embedding"))
      .repartition(16).cache()
    sweep.count()
    var shuffleBytes = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(sl)
    val t0 = System.nanoTime()
    val rows = Similarity.annJoin(sweep, sweep, "vec_id", "embedding", 10,
      nlist = nlist, nprobe = nprobe).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener bus drain
    spark.sparkContext.removeSparkListener(sl)
    val routedEst = n * nprobe * (dim * 8L + 32L)
    println(f"[scale] ann_join_self @$n nlist=$nlist nprobe=$nprobe: " +
      f"$rows rows in $secs%.1f s; shuffle write ${shuffleBytes / 1e6}%.0f MB " +
      f"(routed est ${routedEst / 1e6}%.0f MB >> 8 MB gate -> merge join, " +
      "no broadcast)")
    sweep.unpersist()
  }
}

/** Standalone entry for [[ScaleProbe.annSelfSweep]] — the
  * corpus-self-sweep evidence row without the full probe suite:
  * `sbt "runMain graft.AnnSweepProbe [n]"`. */
object AnnSweepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.annSelfSweep(spark,
      args.headOption.map(_.toLong).getOrElse(100000L))
    spark.stop()
  }
}

/** Standalone entry for the embedding-gate compaction evidence row
  * (the r9 verdict's measured-not-asserted item): one-file-per-batch
  * accretion across 16 micro-batches, then the gate's own fenced
  * [[graft.streaming.SemDeDupGate.compactState]], with the SAME probe
  * batch timed against the pre- and post-compaction layouts.
  * `sbt "runMain graft.SemGateCompactionProbe"`. */
object SemGateCompactionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.SemDeDupGate
    def probe[T](name: String)(f: => T): T = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val tmp = java.nio.file.Files.createTempDirectory("semgate-compact").toString
    val (o, s) = (s"$tmp/out", s"$tmp/state")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val all = emb.orderBy("vec_id").limit(4000)
      .select(col("vec_id").as("vid"), col("embedding").as("v")).cache()
    all.count()
    (0 until 16).foreach { i =>
      SemDeDupGate.curateBatch(all.where(pmod(col("vid"), lit(16)) === i),
        o, s, minCos = 0.95, nlist = 64, nprobe = 4)
    }
    val root = new org.apache.hadoop.fs.Path(s"$s/vecs")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stateFiles(): Int = fs.listStatus(root).filter(_.isDirectory)
      .map(d => fs.listStatus(d.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))).sum
    val pb = emb.orderBy("vec_id").limit(10)
      .select((col("vec_id") + lit(1L << 41)).as("vid"), col("embedding").as("v"))
    val filesBefore = stateFiles()
    probe("semgate_probe pre-compaction")(
      SemDeDupGate.curateBatch(pb, o, s, minCos = 0.95, nlist = 64, nprobe = 4))
    probe("semgate_compact (maintenance)")(
      SemDeDupGate.compactState(spark, o, s, maxFiles = 2))
    val filesAfter = stateFiles()
    probe("semgate_probe post-compaction")(
      SemDeDupGate.curateBatch(pb.select((col("vid") + 10L).as("vid"), col("v")),
        o, s, minCos = 0.95, nlist = 64, nprobe = 4))
    println(s"[scale] semgate compaction: state files $filesBefore -> $filesAfter")
    spark.stop()
  }
}

/** Standalone evidence row for [[graft.functions.Dedup.lineDedup]] at
  * the 20×-replicated corpus: the line-frequency aggregation + anti-join
  * + reassembly against ~100k multi-line docs with planted cross-doc
  * boilerplate. `sbt "runMain graft.LineDedupProbe [factor]"`. */
object LineDedupProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    // every doc gets a shared global footer + a per-copy banner (hot at
    // factor docs each) + its own text line; ids perturbed per copy
    val big = base.crossJoin(spark.range(factor).toDF("copy"))
      .select(
        (col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(col("text"), lit("\nGLOBAL FOOTER LINE"),
          lit("\nbanner "), col("copy"), lit("\nc"), col("copy"),
          lit(" "), col("text")).as("text"))
      .repartition(16).cache()
    val n = big.count()
    val t0 = System.nanoTime()
    val out = Dedup.lineDedup(big, "doc_id", "text", minDocs = 5)
    val (rows, kept) = (out.count(),
      out.agg(sum(col("n_kept"))).head().getLong(0))
    println(f"[scale] line_dedup @$n docs: $rows docs out, $kept lines kept " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s (global footer + " +
      "per-copy banners + 20-way duplicated content lines stripped)")
    spark.stop()
  }
}

/** Skewed-state evidence for the embedding gate's incremental list
  * split: a state with ONE hot list (half the corpus quantizes there),
  * the SAME probe batch timed against the skewed layout and the
  * post-[[graft.streaming.SemDeDupGate.splitList]] layout, with the
  * bytes a probe's routed reads can touch (hot-list flat bytes vs the
  * subProbe largest sub-lists). `sbt "runMain graft.SemGateSplitProbe"`. */
object SemGateSplitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.SemDeDupGate
    val tmp = java.nio.file.Files.createTempDirectory("semgate-split").toString
    val (o, s) = (s"$tmp/out", s"$tmp/state")
    val dim = 32
    val rnd = new scala.util.Random(97)
    def vec() = Seq.fill(dim)(rnd.nextGaussian())
    // 16 diverse low-id seeds anchor the coarse lists; then HALF the
    // corpus crowds seed 0's direction -> one hot list
    val seeds = (0L until 16L).map(i => (i, vec()))
    val anchor = seeds.head._2
    // the hot list is MULTI-MODAL: four sub-directions crowd seed 0's
    // coarse list (each mode separable by sub-centroids). The contrast
    // shape — one tight single cluster — is probed afterwards: it is
    // the embedding analog of the text gate's single-hot-key leaf,
    // which splitting cannot shrink (documented boundary)
    val modes = (0 until 4).map(_ => vec().map(_ * 0.6))
    val hotRows = (16L until 20016L).map { i =>
      val m = modes((i % 4).toInt)
      (i, anchor.zip(m).map { case (a, o) => a + o + 0.05 * rnd.nextGaussian() })
    }
    val coldRows = (20016L until 40016L).map(i => (i, vec()))
    val seed = (seeds ++ hotRows ++ coldRows).toDF("vid", "v")
      .repartition(16).cache()
    seed.count()
    SemDeDupGate.curateBatch(seed, o, s, minCos = 0.98, nlist = 16, nprobe = 2)
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirBytes(p: String): Long = {
      val pp = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(pp)) 0L
      else fs.listStatus(pp).filter(_.isFile).map(_.getLen).sum
    }
    val hot = (0 until 16).maxBy(l => dirBytes(s"$s/vecs/list=$l"))
    val hotBytes = dirBytes(s"$s/vecs/list=$hot")
    def probeBatch(tag: String, off: Long): Unit = {
      // probes are near-dups of MODE 0 — post-split they route to mode
      // 0's sub-lists only
      val pb = (0 until 10).map { i =>
        (off + i, anchor.zip(modes(0)).map { case (a, m) =>
          a + m + 0.05 * rnd.nextGaussian() })
      }.toDF("vid", "v")
      val t0 = System.nanoTime()
      val adm = SemDeDupGate.curateBatch(pb, o, s, minCos = 0.98,
        nlist = 16, nprobe = 2)
      println(f"[scale] semgate_split probe $tag: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s (admits $adm of 10)")
    }
    probeBatch("PRE-split (hot flat list)", 1L << 41)
    val t0 = System.nanoTime()
    SemDeDupGate.splitList(spark, s, hot, nsub = 8)
    println(f"[scale] semgate_split maintenance (split list=$hot into 8): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    probeBatch("POST-split (sub-lists)", 1L << 42)
    val subBytes = (0 until 8)
      .map(sb => dirBytes(s"$s/vecs/list=$hot/sub=$sb")).sorted.reverse
    println(f"[scale] semgate_split bytes: hot flat list ${hotBytes / 1e6}%.1f MB; " +
      f"post-split a probe touches <= subProbe=2 sub-lists <= " +
      f"${subBytes.take(2).sum / 1e6}%.1f MB of ${subBytes.sum / 1e6}%.1f MB total")
    spark.stop()
  }
}

/** Measured ANN recall evidence (docs/SCALE.md): recall@10 vs the exact
  * cosine top-10 for the stored-artifact IVF-PQ ADC probe and its
  * IVFADC+R exact-re-rank twin, across nprobe settings, averaged over
  * query vectors drawn from the corpus — the accuracy/cost curve a
  * user tuning nprobe actually needs. Artifacts are written ONCE (the
  * serving shape); each setting then probes the stored codes only, so
  * the sweep prices recall against scan fraction, not training.
  * `sbt "runMain graft.AnnRecallProbe [nQueries]"`. */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val nq = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1").cache()
    val n = emb.count()
    val k = 10
    val qids = 0L until nq.toLong
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact = qids.map(q => q -> ids(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k))).toMap
    println(s"[scale] ann_recall corpus=$n queries=$nq k=$k, nlist=16")
    // three configs: the registry default (m=4, ks=8 — 12-bit codes,
    // oracle-tuned for determinism, not recall), a denser book
    // (m=8, ks=16 — 32-bit codes), and the denser book over
    // unit-normalized vectors (cosine-faithful ADC — the geometry fix)
    for ((m, ks, nrm) <- Seq((4, 8, false), (8, 16, false), (8, 16, true))) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"ann-recall-$m-$ks-$nrm").toString
      Similarity.ivfPqWriteArtifacts(emb, "vec_id", "embedding", dir,
        m = m, ks = ks, normalize = nrm)
      for (np <- Seq(1, 2, 4, 8)) {
        def recall(f: Long => org.apache.spark.sql.DataFrame): Double =
          qids.map(q => ids(f(q)).intersect(exact(q)).size / k.toDouble)
            .sum / nq
        val adc = recall(q => Similarity.ivfPqProbeFromDir(
          emb, "vec_id", "embedding", dir, q, k, nprobe = np))
        val rr = Seq(50, 200, 1000).map(sl => sl -> recall(q =>
          Similarity.ivfPqRerankFromDir(
            emb, "vec_id", "embedding", dir, q, k, shortlist = sl, nprobe = np)))
        // shortlist >> candidate count re-ranks EVERY probed-list vector
        // exactly, so the last column IS the probed lists' coverage
        // ceiling — what any ranking over these candidates could reach
        println(f"[scale] ann_recall m=$m ks=$ks norm=$nrm nprobe=$np " +
          f"(scan ~${np / 16.0}%.3f): adc = $adc%.3f, " +
          rr.map { case (sl, r) => f"rerank@$sl = $r%.3f" }.mkString(", ") +
          " (rerank@1000 = list-coverage ceiling)")
      }
    }
    spark.stop()
  }
}

/** Cost-and-recall evidence for the r13 PRODUCTION ANN defaults
  * (docs/SCALE.md): the dense codebook (m=8/ks=16 —
  * [[Similarity.DefaultM]]/[[Similarity.DefaultKs]]) + normalize-at-
  * index-time + candidate-proportional AUTO rerank shortlist, measured
  * at 100k vectors (50× the recall probe's corpus) on the same
  * deterministic diverse-direction generator as the self-sweep probe.
  * Reports build time, per-query stored-probe latency (ADC and
  * auto-shortlist rerank), the resolved shortlist, and recall@10 vs
  * exact cosine — so the default configuration's cost story is
  * measured, not asserted. nlist scales with the corpus (256 here, the
  * semdedup/ann_join probes' discipline); m/ks stay the shipped
  * defaults. `sbt "runMain graft.AnnDenseProbe [n]"`. */
object AnnDenseProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val nlist = 256
    val emb = spark.range(n).toDF("vec_id")
      .select(col("vec_id"), transform(sequence(lit(1), lit(dim)),
        j => sin(col("vec_id") * j.cast("double") * 0.7321)).as("embedding"))
      .repartition(16).cache()
    emb.count()
    val dir = java.nio.file.Files.createTempDirectory("ann-dense").toString
    val t0 = System.nanoTime()
    // the call a production pipeline makes: ALL codebook defaults
    // (dense m=8/ks=16), cosine-faithful geometry
    Similarity.ivfPqWriteArtifacts(emb, "vec_id", "embedding", dir,
      nlist = nlist, normalize = true)
    println(f"[scale] ann_dense build @$n nlist=$nlist m/ks=default: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val k = 10
    val qids = 0L until 10L
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact = qids.map(q => q -> ids(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k))).toMap
    for (np <- Seq(4, 8, 16)) {
      val sl = Similarity.rerankShortlist(n, nlist, np, k)
      def timeAvg(f: Long => org.apache.spark.sql.DataFrame): (Double, Double) = {
        var secs = 0.0; var rec = 0.0
        qids.foreach { q =>
          val s0 = System.nanoTime()
          val got = ids(f(q))
          secs += (System.nanoTime() - s0) / 1e9
          rec += got.intersect(exact(q)).size / k.toDouble
        }
        (secs / qids.length, rec / qids.length)
      }
      val (adcS, adcR) = timeAvg(q => Similarity.ivfPqProbeFromDir(
        emb, "vec_id", "embedding", dir, q, k, nprobe = np))
      // default AUTO shortlist — resolved inside the call
      val (rrS, rrR) = timeAvg(q => Similarity.ivfPqRerankFromDir(
        emb, "vec_id", "embedding", dir, q, k, nprobe = np))
      println(f"[scale] ann_dense @$n nprobe=$np (scan ~${np.toDouble / nlist}%.3f, " +
        f"auto shortlist=$sl): adc $adcS%.2f s recall@10=$adcR%.2f; " +
        f"rerank(auto) $rrS%.2f s recall@10=$rrR%.2f")
    }
    spark.stop()
  }
}

/** Block-max WAND pruning priced at scale (docs/SCALE.md): a 100k-doc
  * corpus with the planted skew real corpora have along insertion order
  * (one crawl window carries the high-tf template flood), laid out at
  * 16 doc-range blocks. Measures the block survivor count, the bytes
  * the pruned scoring scan reads vs the unpruned stored top-k, wall
  * times, and asserts the two top-k results agree — the exactness +
  * cost story in one run. `sbt "runMain graft.WandProbe [n]"`. */
object WandProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.PostingsIndex
    val span = n / 16
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < span, lit(("mid " * 12) + "common"))
        .otherwise(when(col("id") % 2 === 0, lit("mid common pad pad"))
          .otherwise(lit("common pad pad pad"))).as("text"))
      .repartition(16)
    val dir = java.nio.file.Files.createTempDirectory("wand-probe").toString
    val (tfP, dlP, wP) = (s"$dir/tf", s"$dir/dl", s"$dir/wand")
    PostingsIndex.tfIndexBatch(docs, 0, tfP, dlP)
    val t0 = System.nanoTime()
    PostingsIndex.wandLayoutFrom(spark, tfP, wP, span = span)
    println(f"[scale] wand layout @$n docs, span=$span (16 blocks): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s rewrite")
    val terms = Seq("mid", "common")
    val k = 10
    var bytes = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes += s.stageInfo.taskMetrics.inputMetrics.bytesRead
    }
    def measured[T](f: => T): (T, Long, Double) = {
      bytes = 0L
      spark.sparkContext.addSparkListener(sl)
      val t = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t) / 1e9
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(sl)
      (r, bytes, secs)
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (kept, _) = PostingsIndex.wandPlan(spark, wP, dlP, terms, k, 1.2, 0.75)
    val (wand, wandBytes, wandSecs) = measured(
      rows(PostingsIndex.searchBm25Wand(spark, wP, dlP, terms, k)))
    val (plain, plainBytes, plainSecs) = measured(
      rows(PostingsIndex.bm25FromStored(spark, tfP, dlP, terms)
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(k)))
    require(wand.map(_._1) == plain.map(_._1),
      s"WAND top-k ids diverged from the unpruned stored path")
    println(f"[scale] wand_probe @$n docs, query=[mid(df~56%%), common(df=N)]: " +
      f"blocks kept ${kept.length}/16; WAND $wandSecs%.2f s / " +
      f"${wandBytes / 1e6}%.1f MB read (incl. the seed phase) vs unpruned " +
      f"stored top-k $plainSecs%.2f s / ${plainBytes / 1e6}%.1f MB; " +
      "top-k ids identical")
    spark.stop()
  }
}

/** Stopword-bound evidence for the stored BM25 scorer (docs/SCALE.md):
  * tf/dl/df artifacts over a factor×-replicated corpus whose every doc
  * carries a planted stopword; the same two-term query served
  * unbounded vs df-bounded, with the bytes the scoring scan actually
  * read (stage input metrics). Partition pruning prunes to the
  * stopword's BUCKET — its Σ df posting rows are corpus-scale
  * regardless — so only the df cut keeps the scan bounded by the
  * surviving terms' posting lists.
  * `sbt "runMain graft.Bm25StopwordProbe [factor]"`. */
object Bm25StopwordProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, concat, lit}
    import graft.streaming.PostingsIndex
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    // every doc starts with the planted stopword; "dup" keeps its
    // natural rare df (~5% of docs) from the fixture text
    val big = base.crossJoin(spark.range(factor).toDF("copy"))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(lit("the c"), col("copy"), lit(" "), col("text")).as("text"))
      .repartition(16).cache()
    val n = big.count()
    val tmp = java.nio.file.Files.createTempDirectory("bm25-stop").toString
    val (tfP, dlP, dfP) = (s"$tmp/tf", s"$tmp/dl", s"$tmp/df")
    PostingsIndex.tfIndexBatch(big, 0, tfP, dlP, dfPath = Some(dfP))
    val terms = Seq("dup", "the")
    var bytesRead = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytesRead += s.stageInfo.taskMetrics.inputMetrics.bytesRead
    }
    def measure(label: String)(f: => Long): Unit = {
      bytesRead = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] bm25_stopword $label%-28s $rows%9d docs scored, " +
        f"${bytesRead / 1e6}%8.1f MB read, $secs%6.2f s")
    }
    println(s"[scale] bm25_stopword corpus=$n docs, query=$terms " +
      "(planted 'the' df = N)")
    measure("unbounded")(
      PostingsIndex.bm25FromStored(spark, tfP, dlP, terms).count())
    measure("df-bounded (maxDfFrac=0.5)")(
      PostingsIndex.bm25FromStored(spark, tfP, dlP, terms,
        dfPath = Some(dfP), maxDfFrac = Some(0.5)).count())
    measure("rare term alone (floor)")(
      PostingsIndex.bm25FromStored(spark, tfP, dlP, Seq("dup")).count())
    spark.stop()
  }
}

/** tf-index retention evidence (docs/SCALE.md): a long snapshot-enabled
  * tf stream with cadence compactions accretes `_stale` trees under the
  * append-retire discipline; [[graft.streaming.Snapshot.vacuum]] at a
  * pinned floor trims files/bytes while a reader pinned AT the floor
  * stays bit-stable — the gate-state retention probe's discipline
  * applied to the tf/dl/df artifact roots.
  * `sbt "runMain graft.TfIndexVacuumProbe [batches]"`. */
object TfIndexVacuumProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(24)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    import graft.streaming.{PostingsIndex, Snapshot}
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text").cache()
    base.count()
    val tmp = java.nio.file.Files.createTempDirectory("tf-vacuum").toString
    val (tfP, dlP, dfP) = (s"$tmp/tf", s"$tmp/dl", s"$tmp/df")
    (0 until nBatches).foreach { b =>
      // pmod slices are already doc-disjoint — the fresh-docs
      // discipline the tf/dl/df index depends on (a doc_id remap here
      // would alias ids ACROSS batches and double-count tf/df)
      PostingsIndex.tfIndexBatch(
        base.where(org.apache.spark.sql.functions.pmod(col("doc_id"),
          org.apache.spark.sql.functions.lit(nBatches)) === b)
          .select(col("doc_id"), col("text")),
        b, tfP, dlP, compactEvery = 4, snapshots = true,
        dfPath = Some(dfP))
    }
    val fs = new org.apache.hadoop.fs.Path(tmp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def treeStats(p: String): (Long, Long) = {
      val root = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(root)) return (0L, 0L)
      var files = 0L; var bytes = 0L
      val it = fs.listFiles(root, true)
      while (it.hasNext) { val f = it.next(); files += 1; bytes += f.getLen }
      (files, bytes)
    }
    def allStats(): (Long, Long) = {
      val s = Seq(tfP, dlP, dfP).map(treeStats)
      (s.map(_._1).sum, s.map(_._2).sum)
    }
    // the retention floor: vacuum keeps 2 versions, so pin the oldest
    // version that SURVIVES and prove it bit-stable across the vacuum
    val keep = 2
    val floorTf = Snapshot.latestVersion(spark, tfP).get - keep + 1
    val floorDl = Snapshot.latestVersion(spark, dlP).get - keep + 1
    val terms = Seq("join", "filter", "dup")
    def pinnedScores() = PostingsIndex.bm25FromStored(spark, tfP, dlP,
      terms, tfVersion = Some(floorTf), dlVersion = Some(floorDl))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val before = allStats()
    val scoresBefore = pinnedScores()
    val (mTf, sTf) = Snapshot.vacuum(spark, tfP, keep)
    val (mDl, sDl) = Snapshot.vacuum(spark, dlP, keep)
    val (mDf, sDf) = Snapshot.vacuum(spark, dfP, keep)
    val after = allStats()
    val scoresAfter = pinnedScores()
    println(f"[scale] tf_vacuum $nBatches batches, compactEvery=4, keep=$keep: " +
      f"${before._1} files / ${before._2 / 1e6}%.2f MB -> " +
      f"${after._1} files / ${after._2 / 1e6}%.2f MB " +
      f"(manifests deleted ${mTf + mDl + mDf}, stale trees ${sTf + sDl + sDf})")
    println(s"[scale] tf_vacuum pinned-at-floor reader bit-stable: " +
      s"${scoresBefore == scoresAfter} (${scoresBefore.length} rows)")
    require(scoresBefore == scoresAfter,
      "pinned-at-floor read drifted across vacuum")
    spark.stop()
  }
}

/** Shuffle-bytes evidence for the bucketed co-located layout
  * ([[graft.operators.BucketedLayout]]): the SAME doc-keyed join +
  * per-key rollup over (a) plain parquet inputs and (b) co-bucketed
  * catalog tables, broadcast disabled so both run the sort-merge path
  * a 100 TB join would. The plain join shuffles BOTH row-scale sides
  * every run; the bucketed join's scans arrive hash-partitioned off
  * the files, so its only exchange is the tiny per-lang rollup — the
  * corpus-scale shuffle happens ONCE, at the ingest write (measured and
  * reported separately, so the trade is priced honestly).
  * `sbt "runMain graft.BucketedJoinProbe [n]"`. */
object BucketedJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val tmp = java.nio.file.Files.createTempDirectory("bucket-probe").toString
    spark.range(n).select(col("id").as("doc_id"),
        (col("id") % 7).cast("string").as("lang"),
        (col("id") % 997).as("n_chars"))
      .write.parquet(s"$tmp/docs")
    spark.range(n).select(col("id").as("vec_id"),
        (col("id") % 5).cast("int").as("label"))
      .write.parquet(s"$tmp/emb")

    var shuffleBytes = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def measured(label: String)(job: => Long): Unit = {
      shuffleBytes = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val out = job
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] bucket_join $label @$n: out=$out " +
        f"(rows, or files for writes), " +
        f"shuffle write ${shuffleBytes / 1e3}%.0f KB, $secs%.2f s")
    }
    def fileCount(table: String): Int = {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(loc).count(_.getPath.getName.endsWith(".parquet"))
    }
    def rollup(d: org.apache.spark.sql.DataFrame,
               e: org.apache.spark.sql.DataFrame): Long =
      d.join(e, col("doc_id") === col("vec_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("cnt"), sum(col("label")).as("ls"))
        .count()

    measured("plain")(rollup(
      spark.read.parquet(s"$tmp/docs"), spark.read.parquet(s"$tmp/emb")))
    measured("bucketed_write(once)") {
      graft.operators.BucketedLayout.writeBucketed(
        spark.read.parquet(s"$tmp/docs"), "graft_probe_docs_b", "doc_id", 16)
      graft.operators.BucketedLayout.writeBucketed(
        spark.read.parquet(s"$tmp/emb"), "graft_probe_emb_b", "vec_id", 16)
      fileCount("graft_probe_docs_b").toLong
    }
    measured("bucketed")(rollup(
      spark.table("graft_probe_docs_b"), spark.table("graft_probe_emb_b")))
    // file-count hygiene for a long-lived layout: one repartition at
    // write time lands exactly `buckets` files instead of tasks×buckets
    measured("bucketed_write(1f/bucket)") {
      graft.operators.BucketedLayout.writeBucketed(
        spark.read.parquet(s"$tmp/docs"), "graft_probe_docs_b1", "doc_id", 16,
        oneFilePerBucket = true)
      fileCount("graft_probe_docs_b1").toLong
    }
    Seq("graft_probe_docs_b", "graft_probe_emb_b", "graft_probe_docs_b1")
      .foreach(t => spark.sql(s"DROP TABLE $t"))
    spark.stop()
  }
}

/** Bytes-read evidence for the z-ordered layout
  * ([[graft.operators.ZOrderLayout]]): the SAME narrow band filters on
  * two INDEPENDENT dimensions over (a) a single-column-sorted layout
  * and (b) the z-ordered rewrite, small row groups so parquet min/max
  * skipping is the decider. Expected shape: the a-sorted layout prunes
  * the a-band hard and reads the WHOLE table for the b-band (its
  * worst case — the second dimension is random within every row
  * group); the z-ordered layout prunes BOTH bands at the curve's
  * √-locality — the bounded worst case a multi-dimension fact table
  * needs. `sbt "runMain graft.ZOrderProbe [n]"`. */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("zorder-probe").toString
    // two independent uniform dims from distinct multiplicative hashes
    val base = spark.range(n).select(col("id"),
      pmod(col("id") * 2654435761L, lit(65536L)).as("a"),
      pmod(col("id") * 40503L + 2147483647L, lit(65536L)).as("b"),
      (col("id") % 97).as("payload"))
    // 1 MB row groups and 64 files: the probe's skipping granularity —
    // at production scale the default 128 MB groups and thousands of
    // files play the same role (an 8×8 z-grid here; a 1000-executor
    // table is far finer, so these ratios are the CONSERVATIVE end)
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    base.repartitionByRange(files, col("a")).sortWithinPartitions("a")
      .write.option("parquet.block.size", 1024 * 1024)
      .mode("overwrite").parquet(s"$tmp/sorted_a")
    withBlockSize(spark, 1024 * 1024) {
      graft.operators.ZOrderLayout.writeZOrdered(
        base, s"$tmp/zorder", Seq("a", "b"), files = files)
    }

    var bytesRead = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytesRead += s.stageInfo.taskMetrics.inputMetrics.bytesRead
    }
    def measured(label: String)(job: => Long): Unit = {
      bytesRead = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val out = job
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] zorder $label @$n: rows=$out, " +
        f"read ${bytesRead / 1e6}%.1f MB, $secs%.2f s")
    }
    // a 1/16-wide band on each dimension
    def bandA(p: String) = spark.read.parquet(p)
      .where(col("a").between(30000, 34095)).count()
    def bandB(p: String) = spark.read.parquet(p)
      .where(col("b").between(30000, 34095)).count()
    measured("sorted_a a-band")(bandA(s"$tmp/sorted_a"))
    measured("sorted_a b-band")(bandB(s"$tmp/sorted_a"))
    measured("zorder   a-band")(bandA(s"$tmp/zorder"))
    measured("zorder   b-band")(bandB(s"$tmp/zorder"))
    spark.stop()
  }

  /** Scope a hadoop-conf parquet block size around `body` (the write
    * option is per-writer; ZOrderLayout's writer doesn't expose one). */
  private def withBlockSize(spark: SparkSession, bytes: Int)(body: => Unit): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = Option(hc.get("parquet.block.size"))
    hc.setInt("parquet.block.size", bytes)
    try body
    finally prev match {
      case Some(v) => hc.set("parquet.block.size", v)
      case None => hc.unset("parquet.block.size")
    }
  }
}

/** Shuffle-bound evidence for rare-first phrase serving
  * ([[graft.streaming.PostingsIndex.phraseFromStoredBounded]]): a
  * phrase CONTAINING a stopword can't use the BM25 df cut (dropping a
  * phrase term changes the query), so the unbounded path shuffles the
  * stopword's corpus-scale posting list into the per-doc aggregation.
  * The bounded path Bloom-prunes on the RAREST term's doc set before
  * the shuffle — both paths still READ the stopword's list (parquet
  * has no in-list skip structure; same honest limit as positional
  * Lucene without skips), so the metric that moves is SHUFFLE bytes,
  * bounded by ≈ |phrase|·df(rarest) rows instead of Σ df.
  * `sbt "runMain graft.PhraseBoundedProbe [factor]"`. */
/** PageRank iteration-cost evidence: a synthetic power-law-ish graph at
  * millions of edges (far beyond the near-dup fixture's pair count),
  * timing (a) iteration scaling — cost must grow LINEARLY in the
  * iteration count (lineage truncation working; un-truncated nesting
  * would re-optimize a growing plan), and (b) edge scaling — per-
  * iteration shuffle write ∝ |E| (the inflow aggregation carries one
  * 16-byte contribution row per directed edge, nothing corpus-scale).
  * `sbt "runMain graft.PageRankProbe [millionEdges]"`. */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraphRank

    // |V| = |E|/4 nodes; mix of a chain (connectivity) and hash edges
    // (degree skew): dst = src*2654435761 mod V clusters mass on low
    // residues, a rough power-law stand-in
    def graph(edges: Long) = {
      val v = edges / 4
      spark.range(edges).selectExpr(
          s"id % $v AS a",
          s"CASE WHEN id % 2 = 0 THEN (id + 1) % $v " +
            s"ELSE (id * 2654435761) % $v END AS b")
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
                greatest(col("a"), col("b")).as("b"))
        .distinct()
    }

    var shuffle = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffle += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def measure(label: String)(f: => Long): Unit = {
      shuffle = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] pagerank $label%-22s $rows%9d nodes, " +
        f"shuffle write ${shuffle / 1e6}%8.1f MB, $secs%6.2f s")
    }

    val g = graph(m * 1000000L).cache()
    println(s"[scale] pagerank graph: ${g.count()} undirected edges " +
      s"(requested ${m}M), ~${m * 250000L} nodes")
    for (it <- Seq(2, 4, 8))
      measure(s"iters=$it")(
        GraphRank.pageRank(g, "a", "b", iters = it).count())
    g.unpersist()
    val g2 = graph(2L * m * 1000000L).cache()
    println(s"[scale] pagerank graph x2: ${g2.count()} undirected edges")
    measure(s"iters=8 |E|x2")(
      GraphRank.pageRank(g2, "a", "b", iters = 8).count())
    spark.stop()
  }
}

/** ExactSubstr scale evidence at the WORST-CASE shape: replicating the
  * corpus N× makes EVERY window a duplicate (the marked-occurrence set
  * is the entire window stream, maximal span work per doc), so the
  * probe measures the ceiling, not a friendly sparse-dup corpus. Cost
  * must scale ~linearly with corpus size — the shuffles carry
  * fixed-width (h, doc, i) triples and spans, never text.
  * `sbt "runMain graft.SubstrDedupProbe [factor]"`. */
object SubstrDedupProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, "/root/testdata/sf0.1")

    var shuffle = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffle += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def measure(label: String)(f: => Long): Unit = {
      shuffle = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] substr $label%-16s $rows%9d rows, " +
        f"shuffle write ${shuffle / 1e6}%8.1f MB, $secs%6.2f s")
    }

    for (f <- Seq(factor, 2 * factor)) {
      val big = base.crossJoin(spark.range(f).toDF("copy"))
        .select((col("doc_id") * (2 * factor) + col("copy")).as("doc_id"),
          col("text"))
        .repartition(16).cache()
      val n = big.count()
      println(s"[scale] substr corpus x$f: $n docs (every window duplicated $f-fold)")
      measure(s"spans x$f")(
        graft.functions.Dedup.exactSubstrSpans(big, "doc_id", "text", L = 8).count())
      measure(s"apply x$f")(
        graft.functions.Dedup.exactSubstrApply(big, "doc_id", "text", L = 8).count())
      big.unpersist()
    }
    spark.stop()
  }
}

object PhraseBoundedProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    import graft.streaming.PostingsIndex
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
    // every doc carries the stopword 'the'; 1/factor of docs open with
    // the planted phrase "dup the" (the rare term's df ≈ N/factor)
    val big = base.crossJoin(spark.range(factor).toDF("copy"))
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        concat(when(col("copy") === 0, lit("dup the "))
          .otherwise(lit("the ")), col("text")).as("text"))
      .repartition(16).cache()
    val n = big.count()
    val tmp = java.nio.file.Files.createTempDirectory("phrase-bound").toString
    val (posP, dfP) = (s"$tmp/pos", s"$tmp/df")
    PostingsIndex.posIndexBatch(big, 0, posP, dfPath = Some(dfP))
    val phrase = Seq("dup", "the")
    var shuffle = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffle += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def measure(label: String)(f: => Long): Unit = {
      shuffle = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus drain
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] phrase_bounded $label%-12s $rows%9d matches, " +
        f"shuffle write ${shuffle / 1e3}%9.0f KB, $secs%6.2f s")
    }
    println(s"[scale] phrase_bounded corpus=$n docs, phrase=$phrase " +
      s"(planted 'the' df = N, 'dup the' opens 1/$factor of docs)")
    measure("unbounded")(
      PostingsIndex.phraseFromStored(spark, posP, phrase).count())
    measure("rare-first")(
      PostingsIndex.phraseFromStoredBounded(spark, posP, phrase, dfP).count())
    spark.stop()
  }
}

/** Semantic-decontamination scale evidence (docs/SCALE.md): the fused
  * [[graft.functions.BestCosine]] scan (zero shuffle — the shipped
  * `q_decontaminate_sem` shape) vs the crossJoin+window formulation
  * the design rejected, over a factor×-replicated embedding corpus
  * against a fixture-bucket bench set. The fused scan's cost is one
  * corpus pass at |bench| fused cosine loops per row; the join form
  * materializes |corpus|×|bench| rows and hash-shuffles them for the
  * per-vector argmax window. `sbt "runMain graft.DeconSemProbe [factor]"`. */
object DeconSemProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{broadcast, col, row_number}
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val bucket = graft.functions.TextAnalysis.hashBucket(col("vec_id"), 16)
    val bench = emb.where(bucket === 15)
    val nb = bench.count()
    // replicate the TRAIN side only (the bench side is a fixed eval
    // suite at any corpus scale); ids offset per copy
    val train = emb.where(bucket =!= 15)
      .crossJoin(spark.range(factor).toDF("copy"))
      .select((col("vec_id") * factor + col("copy")).as("vec_id"),
        col("embedding"))
      .repartition(16).cache()
    val n = train.count()
    println(s"[scale] decon_sem train=$n vectors (×$factor), bench=$nb")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] decon_sem $label%-22s $rows%9d flagged, $secs%7.2f s" +
        f" (${n / secs / 1e6}%6.2f M vec/s)")
    }
    time("fused BestCosine")(Similarity.decontaminateSem(
      train, bench, "vec_id", "embedding", minCos = 0.35).count())
    // the rejected shape: broadcast pair explosion + argmax window
    time("crossJoin+window") {
      val b = bench.select(col("vec_id").as("bench_id"),
        col("embedding").as("bv"))
      val pairs = train.crossJoin(broadcast(b))
        .select(col("vec_id"), col("bench_id"),
          Similarity.cosine(col("embedding"), col("bv")).as("cos_sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id")
        .orderBy(col("cos_sim").desc, col("bench_id").asc)
      pairs.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("cos_sim") >= 0.35)
        .count()
    }
    spark.stop()
  }
}

/** Heavy-hitter scale evidence (docs/SCALE.md): the CMS prefilter's
  * claim is that the exact aggregation's KEY SPACE shrinks from the
  * vocabulary to the candidate set — invisible on the 31-token fixture,
  * so this probe synthesizes a 1M-token vocabulary with planted hot
  * keys and measures the shuffle bytes of the CMS-prefiltered plan vs
  * the plain exact groupBy+HAVING at the same φ (identical answers,
  * asserted). `sbt "runMain graft.HeavyHittersProbe [rows]"`. */
object HeavyHittersProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    // 3 hot tokens at ~5% each; the rest spread over a 1M-key tail
    val items = spark.range(n).select(
      when(col("id") % 20 === 0, lit("hot_a"))
        .when(col("id") % 20 === 1, lit("hot_b"))
        .when(col("id") % 20 === 2, lit("hot_c"))
        .otherwise(concat(lit("bg"), (col("id") % 1000000).cast("string")))
        .as("v")).repartition(16).cache()
    items.count()
    val phi = 0.04
    var shuffleBytes = 0L
    val sl = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    def measure(label: String)(f: => Array[(String, Long)]): Array[(String, Long)] = {
      shuffleBytes = 0L
      spark.sparkContext.addSparkListener(sl)
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      spark.sparkContext.removeSparkListener(sl)
      println(f"[scale] heavy_hitters $label%-16s ${out.length}%3d hitters, " +
        f"${shuffleBytes / 1e6}%8.1f MB shuffled, $secs%6.2f s")
      out
    }
    println(s"[scale] heavy_hitters corpus=$n rows, vocab≈1M, phi=$phi")
    val minCount = math.ceil(phi * n).toLong
    val exact = measure("exact groupBy") {
      items.groupBy("v").count().where(col("count") >= minCount)
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    }
    val sketched = measure("CMS prefilter") {
      graft.functions.Sketches.heavyHitters(items, "v", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    }
    assert(exact.sameElements(sketched), "CMS path diverged from exact")
    println("[scale] heavy_hitters answers identical (asserted)")
    spark.stop()
  }
}

/** SQ8's recall curve, measured the way `AnnDenseProbe` measured PQ's
  * (r13 verdict item 6): 100k synthetic vectors, recall@10 of the fused
  * int8 scan, the stored-codes serve, and the exact re-rank tail, plus
  * measured bytes/vector of the SQ8 codes artifact vs the dense-PQ
  * codes — so the compression-ladder recommendation (raw → SQ8 → PQ) is
  * a measured trade, not an asserted one.
  * `sbt "runMain graft.SqProbe [n]"` → docs/SCALE.md. */
object SqProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val emb = spark.range(n).toDF("vec_id")
      .select(col("vec_id"), transform(sequence(lit(1), lit(dim)),
        j => sin(col("vec_id") * j.cast("double") * 0.7321)).as("embedding"))
      .repartition(16).cache()
    emb.count()
    val dir = java.nio.file.Files.createTempDirectory("sq-probe").toString
    var t0 = System.nanoTime()
    Similarity.sqWriteArtifacts(emb, "vec_id", "embedding", dir)
    println(f"[scale] sq8 build @$n: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // measured artifact density vs the dense-PQ codes at the same n
    val pqDir = java.nio.file.Files.createTempDirectory("sq-probe-pq").toString
    Similarity.ivfPqWriteArtifacts(emb, "vec_id", "embedding", pqDir,
      nlist = 256, normalize = true)
    def dirBytes(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    }
    println(f"[scale] sq8 codes ${dirBytes(s"$dir/codes").toDouble / n}%.0f B/vec " +
      f"vs dense-PQ codes ${dirBytes(s"$pqDir/codes").toDouble / n}%.0f B/vec " +
      f"(raw float64 = ${8 * dim} B/vec)")
    val k = 10
    val qids = 0L until 10L
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    // TWO exact baselines, because SQ8 approximates the raw DOT while
    // the serving contract (and the re-rank) is COSINE: recall of the
    // SQ-alone scan vs exact-dot isolates pure quantization error;
    // recall of the re-rank vs exact-cosine is the end-to-end number
    val exactCos = qids.map(q => q -> ids(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k))).toMap
    val exactDot = qids.map { q =>
      val qv = emb.where(col("vec_id") === q)
        .select(col("embedding").as("q_vec"))
      q -> ids(emb.where(col("vec_id") =!= q)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), graft.functions.VectorExpressions
          .dotProduct(col("embedding"), col("q_vec")).as("d"))
        .orderBy(col("d").desc, col("vec_id").asc).limit(k))
    }.toMap
    def timeAvg(truth: Map[Long, Set[Long]])(
        f: Long => org.apache.spark.sql.DataFrame): (Double, Double) = {
      var secs = 0.0; var rec = 0.0
      qids.foreach { q =>
        val s0 = System.nanoTime()
        val got = ids(f(q))
        secs += (System.nanoTime() - s0) / 1e9
        rec += got.intersect(truth(q)).size / k.toDouble
      }
      (secs / qids.length, rec / qids.length)
    }
    val (fS, fR) = timeAvg(exactDot)(q =>
      Similarity.sqTopK(emb, "vec_id", "embedding", q, k, dim = dim))
    val (pS, pR) = timeAvg(exactDot)(q =>
      Similarity.sqProbeFromDir(emb, "vec_id", "embedding", dir, q, k))
    println(f"[scale] sq8 @$n vs exact-dot: fused $fS%.2f s recall@10=$fR%.2f; " +
      f"stored $pS%.2f s recall@10=$pR%.2f")
    for (sl <- Seq(4 * k, 200)) {
      val (rS, rR) = timeAvg(exactCos)(q => Similarity.sqRerankTopK(
        emb, "vec_id", "embedding", q, k, shortlist = sl, dim = dim))
      println(f"[scale] sq8 rerank @$n shortlist=$sl vs exact-cosine: " +
        f"$rS%.2f s recall@10=$rR%.2f")
    }
    spark.stop()
  }
}

/** The planted-flood batch skew probe (r13 verdict item 7): 10k
  * verbatim copies of one template dropped into the sf0.1 corpus put
  * ~10k members into ONE band bucket per band — the |bucket|² shape the
  * streaming gate mitigates with its hot-band list, now priced for the
  * BATCH miners. Measures the quadratic blow-up on an uncapped run at
  * growing flood sizes, then shows both batch mitigations bounding the
  * output at the full 10k flood: the `maxBucket` degenerate-bucket cap
  * and the mined boilerplate drop list (identical organic pair sets,
  * asserted). `sbt "runMain graft.FloodProbe [floodSize]"`. */
object FloodProbe {
  def main(args: Array[String]): Unit = {
    val floodN = args.headOption.map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text")
    val template = "breaking news template header shared across every " +
      "syndicated copy of this article body text goes here verbatim"
    def corpus(copies: Long) = base.union(
      spark.range(copies).select(
        (col("id") + 1000000L).as("doc_id"), lit(template).as("text")))
      .repartition(16).cache()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // the quadratic staircase: uncapped pair counts/times at small
    // flood sizes (the full 10k flood is ~8e8 expanded pairs — priced
    // by extrapolation, not executed)
    for (c <- Seq(500L, 1000L, 2000L)) {
      val df = corpus(c); df.count()
      val (pairs, secs) = timed(
        Dedup.minhashPairs(df, "doc_id", "text").count())
      println(f"[flood] uncapped copies=$c%5d: $pairs%9d pairs $secs%7.1f s")
      df.unpersist()
    }
    val df = corpus(floodN); df.count()
    val (capped, capSecs) = timed(
      Dedup.minhashPairs(df, "doc_id", "text",
        maxBucket = Some(1000)).count())
    println(f"[flood] maxBucket=1000 copies=$floodN: $capped%9d pairs $capSecs%7.1f s")
    val (drop, dropSecs) = timed {
      val dl = graft.queries.PipelineQueries.boilerplateOf(
        df, minDf = 5000, topK = 100)
      Dedup.minhashPairs(df, "doc_id", "text",
        dropShingles = Some(dl)).count()
    }
    println(f"[flood] drop-list    copies=$floodN: $drop%9d pairs $dropSecs%7.1f s " +
      "(incl. mining)")
    // both mitigations keep the SAME organic pairs (flood docs have ids
    // >= 1000000 — everything below is the organic corpus)
    val organicCap = Dedup.minhashPairs(df, "doc_id", "text",
        maxBucket = Some(1000))
      .where(col("doc_a") < 1000000L && col("doc_b") < 1000000L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val organicDrop = Dedup.minhashPairs(df, "doc_id", "text",
        dropShingles = Some(graft.queries.PipelineQueries.boilerplateOf(
          df, minDf = 5000, topK = 100)))
      .where(col("doc_a") < 1000000L && col("doc_b") < 1000000L)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(organicCap == organicDrop,
      s"mitigations disagree on organic pairs: ${organicCap.size} vs ${organicDrop.size}")
    println(s"[flood] organic pairs identical under both mitigations: ${organicCap.size}")
    spark.stop()
  }
}

/** Tombstone serving overhead at scale (r14): a 100k-doc stored
  * postings index with 10% of the corpus retired — what does the
  * retire channel cost at serve time vs the untombstoned read, and is
  * the served result still exactly a fresh index over the retained
  * corpus? Also prices the ANN side: a 100k-vector SQ8 probe with 10%
  * tombstones vs without. `sbt "runMain graft.RetireProbe [n]"`. */
object RetireProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("common filler "),
        when(col("id") % 7 === 0, "alpha beta gamma")
          .when(col("id") % 7 === 1, "alpha delta")
          .otherwise("epsilon zeta eta"),
        lit(" tail"), (col("id") % 97).cast("string")).as("text"))
      .repartition(16).cache()
    docs.count()
    val dir = java.nio.file.Files.createTempDirectory("retire-probe").toString
    graft.streaming.PostingsIndex.tfIndexBatch(docs, 0L,
      s"$dir/tf", s"$dir/dl", dfPath = Some(s"$dir/df"))
    val retired = docs.where(col("doc_id") % 10 === 7).select("doc_id")
    graft.streaming.PostingsIndex.retireAppend(retired, s"$dir/retire", 0L)
    val terms = Seq("alpha", "epsilon")
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def serve(retire: Option[String]) = graft.streaming.PostingsIndex
      .searchBm25(spark, s"$dir/tf", s"$dir/dl", terms, 20,
        dfPath = Some(s"$dir/df"), maxDfFrac = Some(0.9),
        retirePath = retire)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (plain, tPlain) = timeIt(serve(None))
    val (tomb, tTomb) = timeIt(serve(Some(s"$dir/retire")))
    println(f"[scale] bm25 serve @$n: plain $tPlain%.2f s, " +
      f"10%% tombstoned $tTomb%.2f s (${tTomb / tPlain}%.2fx)")
    // exactness: the tombstoned serve equals a fresh index over the
    // retained corpus
    val fresh = java.nio.file.Files.createTempDirectory("retire-fresh").toString
    graft.streaming.PostingsIndex.tfIndexBatch(
      docs.where(col("doc_id") % 10 =!= 7), 0L,
      s"$fresh/tf", s"$fresh/dl", dfPath = Some(s"$fresh/df"))
    val freshTop = graft.streaming.PostingsIndex
      .searchBm25(spark, s"$fresh/tf", s"$fresh/dl", terms, 20,
        dfPath = Some(s"$fresh/df"), maxDfFrac = Some(0.9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(tomb == freshTop, "tombstoned serve diverged from fresh index")
    println(s"[scale] bm25 tombstoned == fresh retained index (asserted), " +
      s"${plain.size}/${tomb.size} rows")
    // WAND serving path (r15): block-max pruned serve with the SAME
    // channel — stale block maxima only over-bound under deletion, so
    // the pruned tombstoned serve must equal a fresh layout over the
    // retained corpus, at the usual O(tombstones) anti-join overhead
    graft.streaming.PostingsIndex.wandLayoutFrom(spark, s"$dir/tf",
      s"$dir/wand", span = 4096L)
    def wandServe(retire: Option[String]) = graft.streaming.PostingsIndex
      .searchBm25Wand(spark, s"$dir/wand", s"$dir/dl", terms, 20,
        retirePath = retire)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (_, wPlain) = timeIt(wandServe(None))
    val (wTomb, tWTomb) = timeIt(wandServe(Some(s"$dir/retire")))
    graft.streaming.PostingsIndex.wandLayoutFrom(spark, s"$fresh/tf",
      s"$fresh/wand", span = 4096L)
    val wFresh = graft.streaming.PostingsIndex
      .searchBm25Wand(spark, s"$fresh/wand", s"$fresh/dl", terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(wTomb.map(_._1) == wFresh.map(_._1),
      "tombstoned WAND serve diverged from the fresh retained layout")
    wTomb.zip(wFresh).foreach { case ((id, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9, s"doc $id: $a vs $b") }
    println(f"[scale] bm25 WAND serve @$n: plain $wPlain%.2f s, " +
      f"10%% tombstoned $tWTomb%.2f s (${tWTomb / wPlain}%.2fx); " +
      "tombstoned == fresh retained layout (asserted)")
    // ANN side: SQ8 probe with/without tombstones
    val dim = 64
    val emb = spark.range(n).toDF("vec_id")
      .select(col("vec_id"), transform(sequence(lit(1), lit(dim)),
        j => sin(col("vec_id") * j.cast("double") * 0.7321)).as("embedding"))
      .repartition(16).cache()
    emb.count()
    val sdir = java.nio.file.Files.createTempDirectory("retire-sq").toString
    Similarity.sqWriteArtifacts(emb, "vec_id", "embedding", sdir)
    def sqServe() = Similarity.sqProbeFromDir(
      emb, "vec_id", "embedding", sdir, 0L, 10).collect()
    val (_, sPlain) = timeIt(sqServe())
    Similarity.retireFromDir(
      emb.where(col("vec_id") % 10 === 7).select("vec_id"), "vec_id", sdir, 0L)
    val (got, sTomb) = timeIt(sqServe())
    assert(!got.exists(_.getLong(0) % 10 == 7))
    println(f"[scale] sq8 probe @$n: plain $sPlain%.2f s, " +
      f"10%% tombstoned $sTomb%.2f s (${sTomb / sPlain}%.2fx)")
    spark.stop()
  }
}

/** Takedown-HISTORY growth evidence (r15, docs/SCALE.md): the
  * subtract-at-read contract prices a serve at O(accumulated retire
  * shards) — every read lists and unions the whole channel — while
  * the physical fold resets that cost to the plain-read floor and
  * bounds the channel by the COMPACTION CADENCE instead of the
  * takedown history. This probe accumulates 64 small (0.2%) retire
  * batches against a 100k-doc stored postings index, timing the
  * tombstoned serve at 1/8/32/64 batches, then folds and times the
  * plain serve — asserting at the end that the folded index equals a
  * fresh build over the retained corpus.
  * `sbt "runMain graft.RetireGrowthProbe [n]"`. */
object RetireGrowthProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("common filler "),
        when(col("id") % 7 === 0, "alpha beta gamma")
          .when(col("id") % 7 === 1, "alpha delta")
          .otherwise("epsilon zeta eta"),
        lit(" tail"), (col("id") % 97).cast("string")).as("text"))
      .repartition(16).cache()
    docs.count()
    val dir = java.nio.file.Files.createTempDirectory("retire-growth").toString
    // two ingest batches so the fold has a strictly-increasing watermark
    for (b <- 0L until 2L)
      graft.streaming.PostingsIndex.tfIndexBatch(
        docs.where(col("doc_id") % 2 === b), b,
        s"$dir/tf", s"$dir/dl", dfPath = Some(s"$dir/df"))
    val terms = Seq("alpha", "epsilon")
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def serve(retire: Option[String]) = graft.streaming.PostingsIndex
      .searchBm25(spark, s"$dir/tf", s"$dir/dl", terms, 20,
        dfPath = Some(s"$dir/df"), maxDfFrac = Some(0.9),
        retirePath = retire)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // JVM/codegen warm-up OUTSIDE the measurements, then min-of-3 per
    // point — single timings at this scale are warm-up-dominated
    serve(None); serve(None)
    def minOf3[T](f: => T): Double =
      (1 to 3).map(_ => timeIt(f)._2).min
    val tPlain0 = minOf3(serve(None))
    val checkpoints = Set(1, 8, 32, 64)
    val grown = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    for (b <- 0 until 64) {
      // batch b retires the doc_id % 500 == b slice — 64 disjoint
      // 0.2% takedowns, the drip a real takedown queue produces
      graft.streaming.PostingsIndex.retireAppend(
        docs.where(col("doc_id") % 500 === b).select("doc_id"),
        s"$dir/retire", b.toLong)
      if (checkpoints(b + 1))
        grown += ((b + 1, minOf3(serve(Some(s"$dir/retire")))))
    }
    println(f"[scale] bm25 serve @$n, plain floor $tPlain0%.2f s; " +
      "tombstoned serve vs accumulated retire batches: " +
      grown.map { case (k, t) => f"$k%d -> $t%.2f s" }.mkString(", "))
    // the fold makes the takedowns byte-real and resets the serve
    val (_, tFold) = timeIt(
      graft.streaming.PostingsIndex.foldRetiredPostings(
        spark, s"$dir/tf", s"$dir/dl", s"$dir/retire",
        dfPath = Some(s"$dir/df")))
    val tAfter = minOf3(serve(None))
    val folded = serve(None)
    println(f"[scale] fold ran in $tFold%.2f s; post-fold plain serve " +
      f"$tAfter%.2f s (vs ${grown.last._2}%.2f s at 64 pending batches)")
    // exactness: the folded index equals a fresh build over retained
    val fresh = java.nio.file.Files.createTempDirectory("retire-growth-f").toString
    graft.streaming.PostingsIndex.tfIndexBatch(
      docs.where(col("doc_id") % 500 >= 64), 0L,
      s"$fresh/tf", s"$fresh/dl", dfPath = Some(s"$fresh/df"))
    val freshTop = graft.streaming.PostingsIndex
      .searchBm25(spark, s"$fresh/tf", s"$fresh/dl", terms, 20,
        dfPath = Some(s"$fresh/df"), maxDfFrac = Some(0.9))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(folded == freshTop,
      "folded serve diverged from a fresh retained-corpus index")
    println(s"[scale] folded == fresh retained index (asserted), " +
      s"${folded.size} rows")
    spark.stop()
  }
}

/** Bloom-decontamination evidence (r15, docs/SCALE.md): at what bench
  * size does the 8-MB-capped Bloom prune beat broadcasting the exact
  * shingle-string set? A 100k-doc train corpus with a planted 1%
  * contamination rate is decontaminated against a bench of 2k and 20k
  * docs through both paths; the probe reports the map-side survival
  * fraction (how much of the train shingle stream reaches the exact
  * verify), wall times, and asserts both paths return the identical
  * contaminated set. `sbt "runMain graft.BloomDeconProbe [n]"`. */
object BloomDeconProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Bloom, Dedup}
    import graft.queries.CurationQueries
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // 12-token docs, token vocabulary wide enough that bench shingles
    // are rare in train EXCEPT the planted 1% contaminated docs, which
    // copy a bench doc's text verbatim
    def corpus(rows: Long, salt: String) = spark.range(rows)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(j =>
          concat(lit(s"$salt$j"), ((col("id") * (j + 7)) % 9973)
            .cast("string"))): _*).as("text"))
    for (benchN <- Seq(2000L, 20000L)) {
      val bench = corpus(benchN, "b").repartition(16).cache()
      val clean = corpus(n, "t")
      // plant: doc_id % 100 == 3 copies bench doc (doc_id % benchN)
      val train = clean.as("c")
        .join(bench.select(col("doc_id").as("bid"),
          col("text").as("btext")),
          col("c.doc_id") % benchN === col("bid"), "left")
        .select(col("c.doc_id").as("doc_id"),
          when(col("c.doc_id") % 100 === 3, col("btext"))
            .otherwise(col("c.text")).as("text"))
        .repartition(16).cache()
      train.count(); bench.count()
      def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val (exact, tExact) = timeIt(toSet(
        CurationQueries.decontaminateAgainst(train, bench)))
      val (bloomed, tBloom) = timeIt(toSet(
        CurationQueries.decontaminateBloomAgainst(train, bench)))
      assert(bloomed == exact,
        s"bloom path diverged from broadcast-exact at bench=$benchN")
      // survival fraction: how much of the train stream passes the prune
      val trainSh = Dedup.shingles(train, "doc_id", "text", 5).cache()
      val total = trainSh.count()
      val hashed = Dedup.shingles(bench, "doc_id", "text", 5)
        .select(Dedup.md5Hash60(col("shingle")).as("h"))
      val first = hashed.select(Bloom.bloomAgg(col("h"), 1 << 16, 3).as("w"),
        approx_count_distinct(col("h")).as("nk")).head()
      val need = Bloom.sizedBits(first.getLong(1), 1 << 16)
      val words = if (need <= (1 << 16)) first.getSeq[Long](0).toArray
        else hashed.select(Bloom.bloomAgg(col("h"), need, 3).as("w"))
          .head().getSeq[Long](0).toArray
      val survive = trainSh.where(
        Bloom.contains(Dedup.md5Hash60(col("shingle")), words, 3)).count()
      trainSh.unpersist(); train.unpersist(); bench.unpersist()
      println(f"[scale] bloom decon @$n train / $benchN bench: " +
        f"exact ${tExact}%.2f s, bloom ${tBloom}%.2f s; " +
        f"${words.length * 64}%d filter bits, survival " +
        f"${survive.toDouble / total}%.4f ($survive/$total shingles reach " +
        f"the verify); ${exact.size} contaminated docs, paths identical " +
        "(asserted)")
    }
    spark.stop()
  }
}

/** Gate-takedown evidence at scale (r15, docs/SCALE.md): the streaming
  * near-dup gate's retire story priced at a 100k-doc state — (a) the
  * admit decision with pending tombstones (probe-time subtraction) vs
  * without, (b) the physical eviction's cost and its leaf-rewrite
  * count, (c) post-eviction admit correctness: a near-dup of retired
  * content admits, a near-dup of retained content still drops.
  * `sbt "runMain graft.GateRetireProbe [n]"`. */
object GateRetireProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.NearDupGate
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // doc-unique salted text (the q_neardup_gate_retire construction):
    // no organic pairs, so admit counts are exactly predictable and
    // every measured cost is the machinery's, not the fixture's
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit(s"w$j"), col("id"))): _*).as("text"))
      .repartition(16).cache()
    docs.count()
    val dir = java.nio.file.Files.createTempDirectory("gate-retire").toString
    val (out, state) = (s"$dir/out", s"$dir/state")
    val (admitted, tIngest) = timeIt(
      NearDupGate.curateBatch(docs, out, state))
    println(f"[scale] gate ingest @$n: $admitted admitted in $tIngest%.1f s")
    // retire 10%
    val retired = docs.where(col("doc_id") % 10 === 7).select("doc_id")
    NearDupGate.retireAppend(retired, state, 0L)
    // copies of retired content (new ids) must ADMIT against the
    // tombstone-subtracted state; copies of retained content DROP
    val copies = docs
      .where(col("doc_id") % 10 === 7 || col("doc_id") % 10 === 3)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val (admit2, tProbe) = timeIt(
      NearDupGate.curateBatch(copies, out, state))
    val wantAdmit = retired.count()
    assert(admit2 == wantAdmit,
      s"expected exactly the $wantAdmit retired-content copies to admit, got $admit2")
    println(f"[scale] tombstoned admit batch (20%% of corpus, half " +
      f"suppressed): $tProbe%.1f s, admits exact ($admit2)")
    // physical eviction: leaves rewritten, channel consumed
    val ((scanned, rewritten), tEvict) = timeIt(
      NearDupGate.evictRetired(spark, out, state))
    println(f"[scale] eviction @${wantAdmit} tombstoned docs (+ their " +
      f"$wantAdmit copies' traces): $tEvict%.1f s, " +
      f"$rewritten/$scanned leaves rewritten")
    // post-eviction: the lake holds no retired ids; fresh near-dups of
    // the NEW representatives still drop (cluster stays gated)
    val served = NearDupGate.readOutput(spark, out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!served.exists(id => id < 10000000L && id % 10 == 7),
      "retired ids must be gone from the lake after eviction")
    val (admit3, _) = timeIt(NearDupGate.curateBatch(
      docs.where(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text")),
      out, state))
    assert(admit3 == 0L,
      s"the cluster must stay gated through its new representative, got $admit3 admits")
    println(s"[scale] post-eviction: retired ids scrubbed, cluster still " +
      "gated via the admitted copies (asserted)")

    // ---- DENSITY-THRESHOLDED eviction (r16): rewrite ∝ footprint ----
    // The phase above prices the r15 worst case: uniform takedowns put
    // a few tombstones in EVERY leaf, so the unconditional pass
    // rewrites O(state) for an O(takedown) footprint. With a density
    // bound, a SMALL takedown carries everywhere (counting scan only,
    // zero rewrites, admits exact through the channel); only once
    // accumulated takedowns cross the per-leaf bound do leaves rewrite
    // — cost follows the takedown mass, not the leaf count.
    val dir2 = java.nio.file.Files.createTempDirectory("gate-dense").toString
    val (out2, state2) = (s"$dir2/out", s"$dir2/state")
    NearDupGate.curateBatch(docs, out2, state2)
    val small = docs.where(col("doc_id") % 50 === 7).select("doc_id") // 2%
    NearDupGate.retireAppend(small, state2, 0L)
    val ((sc1, rw1), tSmall) = timeIt(
      NearDupGate.evictRetired(spark, out2, state2, minEvictDensity = 0.25))
    println(f"[scale] density-gated eviction @2%% uniform takedown " +
      f"(bound 0.25): $tSmall%.1f s, $rw1/$sc1 leaves rewritten " +
      "(carried: channel kept)")
    // carried state stays EXACT: copies of the retired 2% admit,
    // copies of retained content drop
    val copies2 = docs
      .where(col("doc_id") % 50 === 7 || col("doc_id") % 50 === 3)
      .select((col("doc_id") + 30000000L).as("doc_id"), col("text"))
    val (admit4, _) = timeIt(NearDupGate.curateBatch(copies2, out2, state2))
    val wantAdmit2 = small.count()
    assert(admit4 == wantAdmit2,
      s"carried state must admit exactly the $wantAdmit2 retired-content copies, got $admit4")
    println(f"[scale] carried-state admits exact ($admit4)")
    // accumulate takedowns past the bound: now the rewrite is earned
    NearDupGate.retireAppend(
      docs.where(col("doc_id") % 2 === 0).select("doc_id"), state2, 1L)
    val ((sc2, rw2), tBig) = timeIt(
      NearDupGate.evictRetired(spark, out2, state2, minEvictDensity = 0.25))
    println(f"[scale] density-gated eviction after accumulating to " +
      f"~52%% takedown: $tBig%.1f s, $rw2/$sc2 leaves rewritten " +
      f"(small-takedown window cost $tSmall%.1f s vs rewrite window " +
      f"$tBig%.1f s — cost follows the takedown mass)")
    spark.stop()
  }
}

/** COUNT-CHANNEL GROWTH (r16, the r15 verdict's item 7): the count
  * families (unigram LM, DSIR, NB, CMS, source-KL, bigram, line-stats)
  * deliberately never FOLD their retire side — re-subtraction is
  * non-idempotent, and the channels are VALUE-keyed, so every shard is
  * bounded by the vocabulary (or the d·w cell space), not the corpus.
  * This probe measures that boundedness instead of asserting it: a
  * fixed-vocab corpus takes 64 drip takedown batches on the unigram-LM
  * and CMS channels; the serve is timed as pending batches grow
  * 1→8→32→64, both channels compact (ingest and retire each fold to
  * ONE m-shard), and the serve is timed again — flat, with scores
  * asserted bit-identical across the compaction (integer sums) and the
  * folded retire shard's row count asserted ≤ |vocab| (resp. d·w).
  * `sbt "runMain graft.CountChannelGrowthProbe [n]"`. */
object CountChannelGrowthProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{Sketches, TextAnalysis => TA}
    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def minOf3[T](f: => T): Double =
      (1 to 3).map(_ => timeIt(f)._2).min
    // FIXED 200-word vocabulary: every doc draws 10 words by id
    // arithmetic, so takedown shards can never exceed 200 rows no
    // matter how many documents a batch retires
    val vocabSize = 200
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("w"), ((col("id") * 31 + j * 7) % vocabSize)
          .cast("string"))): _*).as("text"))
      .repartition(16).cache()
    docs.count()
    val dir = java.nio.file.Files.createTempDirectory("count-growth").toString
    for (b <- 0L until 2L) {
      val slice = docs.where(col("doc_id") % 2 === b)
      TA.unigramCountsAppend(slice, "doc_id", "text", s"$dir/uni", b)
      Sketches.cmsAppend(slice.select(col("doc_id"),
        explode(split(col("text"), " ")).as("v")), "v", s"$dir/cms", b)
    }
    val probeDocs = docs.where(col("doc_id") < 64).cache()
    probeDocs.count()
    val cmsTerms = Seq("w0", "w17", "w123")
    def serveUni(): Seq[(Long, Double)] =
      TA.unigramXentFromCounts(probeDocs, "doc_id", "text", s"$dir/uni")
        .collect().map(r => (r.getLong(0), r.getAs[Double]("xent")))
        .toSeq.sorted
    def serveCms(): Seq[(String, Long)] =
      Sketches.cmsEstimate(Sketches.cmsFromShards(spark, s"$dir/cms"),
        cmsTerms).collect().map(r => (r.getString(0), r.getLong(1)))
        .toSeq.sorted
    serveUni(); serveCms() // codegen/JIT warm-up outside the timings
    val uniFloor = minOf3(serveUni())
    val cmsFloor = minOf3(serveCms())
    val checkpoints = Set(1, 8, 32, 64)
    val curve = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double)]
    for (b <- 0 until 64) {
      // 64 disjoint 0.2%-of-corpus takedowns — the drip a real queue
      // produces; each retire shard is vocab-bounded by construction
      val slice = docs.where(col("doc_id") % 500 === b)
      TA.unigramCountsRetire(slice, "doc_id", "text", s"$dir/uni", b.toLong)
      Sketches.cmsRetire(slice.select(col("doc_id"),
        explode(split(col("text"), " ")).as("v")), "v", s"$dir/cms", b.toLong)
      if (checkpoints(b + 1))
        curve += ((b + 1, minOf3(serveUni()), minOf3(serveCms())))
    }
    println(f"[scale] count channels @$n docs, |vocab|=$vocabSize: " +
      f"floors uni $uniFloor%.2f s / cms $cmsFloor%.2f s; " +
      "serve vs pending retire batches (uni/cms): " +
      curve.map { case (k, u, c) => f"$k%d -> $u%.2f/$c%.2f s" }
        .mkString(", "))
    val preUni = serveUni(); val preCms = serveCms()
    val (_, tCompact) = timeIt {
      TA.compactUnigramCounts(spark, s"$dir/uni")
      Sketches.compactCmsShards(spark, s"$dir/cms")
    }
    val uniAfter = minOf3(serveUni())
    val cmsAfter = minOf3(serveCms())
    // integer sums: compaction is bit-invisible to the scores
    assert(serveUni() == preUni, "unigram scores changed across compaction")
    assert(serveCms() == preCms, "cms estimates changed across compaction")
    // the folded channels are ONE value-bounded shard each — takedown
    // HISTORY is gone from the read no matter how many batches landed
    val uniRetRows = spark.read.parquet(s"$dir/uni/retire").count()
    val cmsRetRows = spark.read.parquet(s"$dir/cms/retire").count()
    assert(uniRetRows <= vocabSize,
      s"folded unigram retire shard must be vocab-bounded, got $uniRetRows")
    assert(cmsRetRows <= 4L * 1024L,
      s"folded cms retire shard must be cell-bounded, got $cmsRetRows")
    println(f"[scale] compaction $tCompact%.1f s; post-compaction serve " +
      f"uni $uniAfter%.2f s / cms $cmsAfter%.2f s (vs ${curve.last._2}%.2f/" +
      f"${curve.last._3}%.2f s at 64 pending batches); folded retire " +
      f"shards: $uniRetRows rows (≤ $vocabSize vocab) / $cmsRetRows cells " +
      "(≤ 4096); scores bit-identical across the fold (asserted)")
    spark.stop()
  }
}

/** MMR defaults measured, not asserted (r16 verdict item 6 — the
  * `AnnRecallProbe` discipline applied to diversified retrieval):
  * sweep λ and the shortlist size N on the sf0.1 embeddings fixture
  * and report the relevance/diversity trade of the top-k each
  * configuration selects — mean relevance (cosine to the query) and
  * mean pairwise cosine among the picks (lower = more diverse). The
  * registry defaults (λ=0.7, N=2.5k) must sit on the measured curve's
  * useful region: diversity strictly better than pure-relevance top-k
  * at a bounded relevance give-up ([[graft.MmrSpec]] pins the floor).
  * `sbt "runMain graft.MmrDefaultsProbe [sfDir]"`. */
object MmrDefaultsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Similarity
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")).cache()
    try {
      val k = 8
      for (q <- Seq(0L, 1L, 2L)) {
        println(s"[mmrprobe] query $q, k=$k:")
        for (n <- Seq(k, 20, 40); lam <- Seq(0.3, 0.5, 0.7, 0.9, 1.0)) {
          val (rel, div) = Similarity.mmrTradeoff(emb, "vec_id", "embedding",
            q, k, n, lam)
          println(f"[mmrprobe]   N=$n%3d lambda=$lam%.1f  " +
            f"mean_rel=$rel%.4f  mean_pair_cos=$div%.4f")
        }
      }
    } finally emb.unpersist()
    spark.stop()
  }
}

/** BPE training/apply cost shape at scale (the r16 tokenizer family's
  * measured claim): the merge LOOP is vocabulary-bounded — corpus rows
  * pay only in the one word-count job — and the apply chain runs at
  * scan speed. Two corpora share a FIXED synthetic vocabulary (md5-hex
  * words, 16-symbol alphabet so merges have real pair structure); the
  * probe times the word-count job and the 16-merge loop separately on
  * each, then times the 32-merge encode chain over the large corpus.
  * Merges trained on both corpora are asserted IDENTICAL (counts scale
  * by the row ratio; the argmax sequence is scale-invariant for the
  * uniform id→word map). `sbt "runMain graft.BpeProbe [rows]"`. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Bpe
    val bigRows = args.headOption.map(_.toLong).getOrElse(8000000L)
    val smallRows = bigRows / 8
    val vocab = 50000L
    def word = substring(md5(col("id").mod(vocab).cast("string")), 1, 8)
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(rows: Long): (Seq[Bpe.Merge], Double, Double) = {
      val (wc, tCount) = time {
        val t = spark.range(rows).select(word.as("word"))
          .groupBy("word").agg(count(lit(1)).as("wc"))
          .persist()
        t.count() // materialize: the corpus-scale job, timed alone
        t
      }
      val (m, tLoop) = time(Bpe.trainMerges(wc, 16))
      wc.unpersist()
      (m, tCount, tLoop)
    }
    // warm-up: the first Spark job pays JIT/codegen setup that would
    // otherwise land on the small corpus's word-count timing
    spark.range(smallRows).select(word.as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc")).count()
    val (mSmall, cSmall, lSmall) = run(smallRows)
    val (mBig, cBig, lBig) = run(bigRows)
    require(mSmall.map(x => (x.x, x.y)) == mBig.map(x => (x.x, x.y)),
      "merge sequence must be scale-invariant for the uniform map")
    // apply: a 32-merge chain over the large corpus's word stream
    val merges32 = {
      val wc = spark.range(bigRows).select(word.as("word"))
        .groupBy("word").agg(count(lit(1)).as("wc")).persist()
      val m = Bpe.trainMerges(wc, 32); wc.unpersist(); m
    }
    val (_, tApply) = time {
      spark.range(bigRows).select(word.as("word"))
        .select(Bpe.tokenCountExpr(col("word"), merges32).as("n"))
        .agg(sum(col("n"))).head()
    }
    println(f"[bpeprobe] vocab=$vocab fixed; corpus ${smallRows}: " +
      f"word-count $cSmall%.1f s, 16-merge loop $lSmall%.1f s; " +
      f"corpus ${bigRows}: word-count $cBig%.1f s, 16-merge loop $lBig%.1f s " +
      f"(loop ratio ${lBig / lSmall}%.2f — vocab-bounded; " +
      f"count ratio ${cBig / cSmall}%.2f — corpus-scale)")
    println(f"[bpeprobe] 32-merge encode over $bigRows%d words: " +
      f"$tApply%.1f s (${bigRows / tApply / 1e6}%.1f M words/s)")

    // ---- occurrence-encode vs distinct-encode-and-join (r16 #4) ----
    // the same corpus as docTokenStats vs docTokenStatsDistinct would
    // see it: per-doc grouping with ~1000 words per doc
    val docsBig = spark.range(bigRows)
      .select((col("id") / 1000).cast("long").as("doc_id"), word.as("word"))
    def agg(perOcc: Boolean): Double = time {
      val base =
        if (perOcc) docsBig.select(col("doc_id"),
            Bpe.tokenCountExpr(col("word"), merges32).as("nt"))
          .groupBy("doc_id").agg(sum(col("nt")).as("n"))
        else {
          val occ = docsBig.groupBy("doc_id", "word")
            .agg(count(lit(1)).as("occ"))
          val dict = occ.select("word").distinct()
            .select(col("word"), Bpe.tokenCountExpr(col("word"), merges32).as("nt"))
          occ.join(dict, Seq("word"))
            .groupBy("doc_id").agg(sum(col("occ") * col("nt")).as("n"))
        }
      base.agg(sum(col("n"))).head()
    }._2
    val tOcc = agg(perOcc = true)
    val tDict = agg(perOcc = false)
    println(f"[bpeprobe] per-doc token totals over $bigRows%d occurrences " +
      f"($vocab%d-word vocab, mean freq ${bigRows / vocab}%d): " +
      f"per-occurrence encode $tOcc%.1f s vs distinct-encode+join " +
      f"$tDict%.1f s — measured winner: " +
      (if (tOcc <= tDict) "PER-OCCURRENCE (the native encode is cheaper " +
        "per word than the distinct shape's two extra shuffles cost per " +
        "row; distinct-join needs encode cost >> shuffle cost — very " +
        "long words or 10^4-merge tables)"
       else "DISTINCT-JOIN (encode dominates the shuffles at this shape)"))

    // ---- frequency-floor sweep: merge-loop cost vs |vocab| ----
    // a crawl-shaped vocabulary: a 50k head the corpus actually reuses
    // plus a once-each tail (typo/URL mass) twice the head's size in
    // ROWS and ~40x in distinct words; minWc=2 evicts the tail before
    // pair counting
    val tailRows = bigRows / 4
    def tailWord = substring(md5((col("id") + 1000000000L).cast("string")), 1, 12)
    val wcMixed = spark.range(bigRows / 2).select(word.as("word"))
      .unionByName(spark.range(tailRows).select(tailWord.as("word")))
      .groupBy("word").agg(count(lit(1)).as("wc")).persist()
    val nAll = wcMixed.count()
    val nHead = wcMixed.where(col("wc") >= 2L).count()
    val (mAll, lAll) = time(Bpe.trainMerges(wcMixed, 16))
    val (mFloor, lFloor) = time(Bpe.trainMerges(wcMixed, 16, minWc = 2L))
    wcMixed.unpersist()
    println(f"[bpeprobe] floor sweep: |vocab| $nAll%d unfloored -> 16-merge " +
      f"loop $lAll%.1f s; minWc=2 floors to $nHead%d -> $lFloor%.1f s " +
      f"(${lAll / lFloor}%.1fx); trained sequence " +
      (if (mAll.map(m => (m.x, m.y)) == mFloor.map(m => (m.x, m.y))) "UNCHANGED"
       else "CHANGED") +
      " by the floor on this corpus (the floor is a semantic knob, " +
      "not a transparent optimization - BpeSpec pins the sensitivity)")
    spark.stop()
  }
}

/** Pack-layout evidence row (late r17): ingest assigns doc ids in
  * arrival order, so a corpus's ids sit in contiguous SOURCE blocks —
  * the exact shape where id-order packing produces single-source
  * context windows. This probe measures, at millions of docs,
  *  (a) the fraction of windows >90% single-source under the id-order
  *      layout vs the epoch-seeded shuffled layout (the semantic
  *      payoff the shuffle buys),
  *  (b) the layouts' wall cost on the same two-level decomposition
  *      (the shuffle adds one md5 per doc — it should NOT add a pass),
  *  (c) the hash-chunk balance that replaces id-range chunking
  *      (uniform hash ⇒ chunks balance regardless of id density).
  * `sbt "runMain graft.PackLayoutProbe [nDocs]"`. */
object PackLayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CurationQueries
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val block = n / 4 // 4 sources in contiguous id blocks
    // deterministic 6..34-token lengths; no text materialized — the
    // pack machinery takes the per-doc count as an expression
    val docs = spark.range(n).select(col("id").as("doc_id"),
      (col("id") * 37 % 29 + 6).as("len"))
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // fraction of windows where one source holds >90% of the slots
    def domFrac(rows: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val per = rows.select(col("bin"),
          expr(s"doc_id div $block").as("src"),
          (col("tok_to") - col("tok_from")).as("m"))
        .groupBy("bin", "src").agg(sum("m").as("m"))
      val top = per.groupBy("bin").agg(max(col("m")).as("top"),
        sum(col("m")).as("tot"))
      val r = top.agg(
        avg((col("top") > col("tot") * 0.9).cast("double")),
        sum(col("tot"))).head
      (r.getDouble(0), r.getLong(1))
    }
    val ((fi, massI), ti) =
      time(domFrac(CurationQueries.packRowsOf(docs, nTok = col("len"))))
    val ((fs, massS), ts) =
      time(domFrac(CurationQueries.packRowsShuffledOf(docs, epoch = 1,
        nTok = col("len"))))
    require(massI == massS,
      s"layouts must pack the same token mass: $massI vs $massS")
    println(f"[packprobe] $n%d docs in 4 contiguous source blocks, " +
      f"${massI}%d tokens: >90%%-single-source windows — id-order " +
      f"$fi%.3f vs shuffled $fs%.4f; wall $ti%.1f s vs $ts%.1f s " +
      "(same decomposition + one md5/doc)")
    // hash-chunk balance at the default nChunks=1024: the shuffled
    // layout's only unpartitioned window runs over these totals
    val span = (1L << 60) / 1024
    val bal = docs.select(
        Dedup.md5Hash60(concat(lit("1:"), col("doc_id").cast("string")))
          .as("hk"), col("len"))
      .select(expr(s"hk div $span").as("ck"), col("len"))
      .groupBy("ck").agg(sum("len").as("m"))
      .agg(max(col("m")).cast("double") / avg(col("m")),
        count(lit(1))).head
    println(f"[packprobe] hash-chunk balance: ${bal.getLong(1)}%d chunks, " +
      f"max/mean token mass ${bal.getDouble(0)}%.3f (id-range chunking " +
      "over these clustered ids would put whole sources in single chunks)")
    spark.stop()
  }
}
