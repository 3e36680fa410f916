package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.streaming.{PostingsIndex, Snapshot}

/** Phrase-search semantics ([[TextAnalysis.phraseMatch]] /
  * [[TextAnalysis.phraseFromPostings]]) and the stored positional-index
  * serving path ([[PostingsIndex.posIndexBatch]] /
  * [[PostingsIndex.phraseFromStored]]). The registry rows `q_phrase` /
  * `q_phrase_stored` / `q_phrase_serve` are DuckDB-oracled on the real
  * corpus; this suite pins what the oracle rows can't: the adjacency
  * edge cases (overlap, repeated terms, doc boundaries), stored-vs-
  * corpus parity over MULTIPLE shards, replay idempotence, and
  * compaction/version-pin stability of the positional artifact. */
class PhraseSearchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def matches(d: org.apache.spark.sql.DataFrame,
                      phrase: String*): Map[Long, (Long, Int)] =
    TextAnalysis.phraseMatch(d, "doc_id", "text", phrase)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap

  test("adjacency: overlapping occurrences each count; non-adjacent terms don't match") {
    val d = docs(
      1L -> "value value value",        // "value value" at 0 and 1 (overlap)
      2L -> "value table x part value", // terms present, never adjacent
      3L -> "a value table part b value table part")
    assert(matches(d, "value", "value") == Map(1L -> (2L, 0)))
    assert(matches(d, "value", "table", "part") == Map(3L -> (2L, 1)))
    assert(matches(d, "value", "part") == Map.empty)
  }

  test("repeated phrase term reuses one positions array; boundaries match") {
    val d = docs(
      1L -> "table table part",   // phrase at the very start
      2L -> "x y table table part", // phrase at the very end
      3L -> "table part table")   // 'table table' absent
    assert(matches(d, "table", "table", "part") ==
      Map(1L -> (1L, 0), 2L -> (1L, 2)))
    assert(matches(d, "table", "table") ==
      Map(1L -> (1L, 0), 2L -> (1L, 2)))
    assert(matches(d, "part", "table") == Map(3L -> (1L, 1)))
  }

  test("single-term phrase degenerates to term lookup: n_matches = tf, first_pos = first occurrence") {
    val d = docs(1L -> "b a b b c", 2L -> "c c", 3L -> "")
    assert(matches(d, "b") == Map(1L -> (3L, 0)))
    assert(matches(d, "c") == Map(1L -> (1L, 4), 2L -> (2L, 0)))
    assert(matches(d, "absent") == Map.empty)
  }

  test("stored positional index serves the corpus-recomputed matches across shards, replay, and compaction") {
    val corpus = graft.Tables.documents(spark, sf0001)
    val phrase = Seq("value", "table")
    val expected = TextAnalysis
      .phraseMatch(corpus, "doc_id", "text", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.nonEmpty, "fixture phrase must match at sf0.001")

    val dir = java.nio.file.Files.createTempDirectory("pos-idx").toString
    val posP = s"$dir/pos"
    // three doc-disjoint batches (the fresh-docs discipline)
    val batches = (0 until 3).map(i => corpus.where(pmod(col("doc_id"), lit(3)) === i))
    def stored() = PostingsIndex.phraseFromStored(spark, posP, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    Snapshot.init(spark, posP)
    batches.zipWithIndex.foreach { case (b, i) =>
      PostingsIndex.posIndexBatch(b, i, posP, snapshots = true) }
    assert(stored() == expected, "multi-shard stored ≠ corpus")
    val pinned = Snapshot.latestVersion(spark, posP)

    // replay of an uncompacted batch rewrites its own shard — no-op
    PostingsIndex.posIndexBatch(batches(1), 1, posP, snapshots = true)
    assert(stored() == expected, "replayed batch changed the result")

    // compaction preserves matches AND the pinned pre-compaction read
    PostingsIndex.compactUnionShards(spark, posP, tokenBuckets = true)
    assert(stored() == expected, "compaction changed the result")
    assert(PostingsIndex.phraseFromStored(spark, posP, phrase, version = pinned)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      == expected, "pinned pre-compaction version drifted")

    // a replayed batch at or below the merged watermark must not
    // double-count (its rows live in the merged shard now)
    PostingsIndex.posIndexBatch(batches(2), 2, posP, snapshots = true,
      lineage = None)
    assert(stored() == expected, "post-compaction replay double-counted")

    // the endpoint cut: top-k by (n_matches desc, doc_id asc)
    val k = 5
    val top = PostingsIndex.searchPhrase(spark, posP, phrase, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = expected.toSeq.map(t => (t._1, t._2))
      .sortBy { case (id, n) => (-n, id) }.take(k)
    assert(top.toSeq == want, s"top-k mismatch: $top vs $want")
  }

  test("rare-first bounded serving is exact: same result, empty on absent terms") {
    val corpus = graft.Tables.documents(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("pos-bounded").toString
    PostingsIndex.posIndexBatch(corpus, 0L, s"$dir/pos",
      dfPath = Some(s"$dir/df"))
    def bounded(ph: Seq[String]) =
      PostingsIndex.phraseFromStoredBounded(spark, s"$dir/pos", ph, s"$dir/df")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def direct(ph: Seq[String]) =
      PostingsIndex.phraseFromStored(spark, s"$dir/pos", ph)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // a common+rare mix (the rare term drives the bound) and a phrase of
    // commons (worst case for the bound, still exact)
    for (ph <- Seq(Seq("value", "table"), Seq("value", "table", "part"),
        Seq("the", "line"), Seq("a", "a")))
      assert(bounded(ph) == direct(ph), s"bounded ≠ direct for $ph")
    assert(direct(Seq("value", "table")).nonEmpty)
    // a vocabulary-absent term still yields empty (via the unbounded
    // fallback — df=0 means UNKNOWN, not absent; see the torn-window test)
    assert(bounded(Seq("value", "absent-token")) == Set.empty)
  }

  test("bounded phrase serving treats a missing df row as unknown: pos/df torn window stays exact") {
    // r12 ADVICE: posIndexBatch writes the pos shard BEFORE the df shard
    // with no consistency pairing, so a read between the two writes (or
    // after a crash between them) sees a term live in the pos index with
    // df=0 in the sidecar. Short-circuiting to empty there returns WRONG
    // matches; the bounded path must fall back to the unbounded exact
    // scan instead. Simulated by indexing batch 1 without the df sidecar:
    // its terms are phrase-servable but df-invisible.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pos-torn").toString
    val (posP, dfP) = (s"$dir/pos", s"$dir/df")
    PostingsIndex.posIndexBatch(
      Seq((1L, "alpha beta gamma"), (2L, "alpha beta")).toDF("doc_id", "text"),
      0L, posP, dfPath = Some(dfP))
    // the torn window: pos shard lands, df shard does not
    PostingsIndex.posIndexBatch(
      Seq((3L, "omega alpha beta")).toDF("doc_id", "text"), 1L, posP)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = rows(PostingsIndex.phraseFromStored(spark, posP,
      Seq("omega", "alpha")))
    assert(direct == Set((3L, 1L, 0)), s"fixture: $direct")
    // df knows nothing of 'omega' (df=0) — the bounded path must match
    // the exact result, not return empty
    assert(rows(PostingsIndex.phraseFromStoredBounded(spark, posP,
      Seq("omega", "alpha"), dfP)) == direct)
    // known-term phrases keep the bounded fast path exact too
    assert(rows(PostingsIndex.phraseFromStoredBounded(spark, posP,
        Seq("alpha", "beta"), dfP)) ==
      rows(PostingsIndex.phraseFromStored(spark, posP, Seq("alpha", "beta"))))
  }

  test("the live positional sink maintains phrase serving across micro-batches with compaction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("pos-sink").toString
    val (posP, dfP) = (s"$dir/pos", s"$dir/df")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = PostingsIndex.startPosIndexSink(
      mem.toDF().toDF("doc_id", "text"), posP, s"$dir/ck",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      compactEvery = 2, snapshots = true, dfPath = Some(dfP))
    val batches = Seq(
      Seq(1L -> "value table part", 2L -> "value x table"),
      Seq(3L -> "a value table part b", 4L -> "part value"),
      Seq(5L -> "value table value table"))
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val all = batches.flatten.toDF("doc_id", "text")
    val phrase = Seq("value", "table")
    val expect = TextAnalysis.phraseMatch(all, "doc_id", "text", phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expect == Set((1L, 1L, 0), (3L, 1L, 1), (5L, 2L, 0)))
    assert(PostingsIndex.phraseFromStored(spark, posP, phrase)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      == expect, "sink-maintained index ≠ corpus recompute")
    // the df sidecar rode along: the bounded path serves the same rows
    assert(PostingsIndex.phraseFromStoredBounded(spark, posP, phrase, dfP)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      == expect, "bounded serving over the sink-maintained df drifted")
  }

  test("phraseFromStored prunes the scan to the phrase terms' token buckets") {
    val dir = java.nio.file.Files.createTempDirectory("pos-prune").toString
    val posP = s"$dir/pos"
    PostingsIndex.posIndexBatch(
      graft.Tables.documents(spark, sf0001), 0L, posP)
    val phrase = Seq("value", "table")
    val plan = PostingsIndex.phraseFromStored(spark, posP, phrase)
      .queryExecution.executedPlan.toString
    val want = phrase.map(PostingsIndex.tokenBucketLocal).toSet
    // a multi-term scan prints `tbucket IN (...)`; a single bucket
    // optimizes to the equality form (the PlanQualitySpec parser)
    val seen = """tbucket[^\]]*IN \(([0-9,]+)\)""".r.findFirstMatchIn(plan)
      .map(_.group(1).split(",").map(_.trim.toInt).toSet)
      .getOrElse("""tbucket#\d+ = ([0-9]+)""".r.findAllMatchIn(plan)
        .map(_.group(1).toInt).toSet)
    // the partition filter names exactly the phrase terms' buckets
    assert(plan.contains("PartitionFilters"), plan.take(600))
    assert(seen == want, s"pruned buckets $seen != phrase buckets $want")
  }
}
