package graft

/** Cache-ownership contract (r5 VERDICT item 4): registry operators own
  * NO session-lifetime caches — nothing a query persists may outlive its
  * action, so long-lived sessions (Verify, Bench, a notebook batching
  * corpora) never need `spark.catalog.clearCache()` between runs.
  *
  * The four operators that carried the old caller-must-clearCache
  * contract were restructured instead of wrapped:
  *  - unigramXent: the corpus token total now comes from a no-shuffle
  *    scan of the documents (row count of the exploded stream ≡ per-doc
  *    token-count sum), so the vocab aggregate has one consumer;
  *  - jaccardPairs: per-doc shingle counts are re-derived from the
  *    bucket aggregation both consumers share (ReusedExchange);
  *  - qualityTopP / tokenBudget: the tiny offsets branch re-runs the
  *    scoring scan with map-side partials to ≤ B+1 rows — one extra
  *    pass traded against a row-scale resident cache;
  *  - decontaminate: split-commuted into the broadcast-bench two-corpus
  *    path (measured cheaper than the cached single-pipeline spelling).
  *
  * Excluded from the no-persistent-storage assert: operators whose
  * internals use SELF-OWNED storage with explicit lifetimes —
  * connectedComponents caches its edge set and unpersists it before
  * returning, and its per-round `localCheckpoint`s are reclaimed by the
  * ContextCleaner once unreachable (GC-owned, not contract-owned).
  */
class CacheOwnershipSpec extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("restructured operators leave no persisted storage after their action") {
    // DELTA-based: suites share the session, and GC-owned residue from
    // another suite's connectedComponents localCheckpoints may still be
    // registered — the contract under test is that THESE queries
    // register nothing new
    val before = persistedIds
    val queries =
      Seq("q_ngram_jaccard", "q_unigram_ppl", "q_quality_topp",
        "q_token_budget", "q_decontaminate", "q_decontaminate_x")
    queries.foreach { q =>
      Bench.materialize(SparkEntry.queries(q)(spark, sf0001))
      val added = persistedIds -- before
      assert(added.isEmpty,
        s"$q left ${added.size} newly persisted RDD(s) registered after its action")
    }
  }

  test("jaccardPairs shares ONE shingle-bucket exchange across its consumers") {
    // static planning (AQE off, like the codegen inspection): the counts
    // branch and the pair-expansion branch must reuse the shingle-keyed
    // exchange — the structural replacement for the removed cache
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.queries("q_ngram_jaccard")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"q_ngram_jaccard lost exchange reuse:\n${p.take(1200)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("connectedComponents releases its self-owned edge cache") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val before = persistedIds
    val out = graft.functions.Dedup.connectedComponents(pairs)
    assert(out.count() == 5)
    assert((persistedIds -- before).isEmpty,
      "connectedComponents left its edge cache registered")
  }
}
