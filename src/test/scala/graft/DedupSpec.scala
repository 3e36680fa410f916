package graft

import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** MinHash/SimHash/Jaccard behavior on planted near-duplicates — the
  * operators whose hash functions are engine-specific and therefore not
  * DuckDB-oracle-checkable (registered rows-only in SparkEntry).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 60 distinct tokens so shingle sets are rich; near-dup differs in
  // exactly one token (5 of 56 shingles) -> exact jaccard ~0.84
  private val base = (0 until 60).map(i => s"tok$i").mkString(" ")
  private def corpus = Seq(
    (0L, base),                                             // original
    (1L, base.replace("tok57", "changed")),                 // near-dup of 0
    (2L, base),                                             // exact dup of 0
    (3L, (0 until 60).map(i => s"alpha$i").mkString(" ")),  // unrelated
    (4L, (0 until 60).map(i => s"beta$i").mkString(" "))    // unrelated
  ).toDF("doc_id", "text")

  test("exactGroups collapses exact duplicates to one keeper") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text")
    assert(g.count() == 4) // 0 and 2 merge
    val dup = g.where($"n_dups" === 2).head()
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("dedupKeepRows keeps the min-id row of the null-text group") {
    val withNulls = Seq(
      (0L, Option(base)), (1L, Option(base)),       // dup group, keep 0
      (2L, None: Option[String]), (3L, None)        // null-text group, keep 2
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupKeepRows(withNulls, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    // a null-rejecting join key (=== on md5(text)) would drop BOTH null
    // rows; SQL GROUP BY semantics (and the DuckDB oracle) keep one
    assert(kept.sameElements(Array(0L, 2L)))
  }

  test("jaccardPairs scores planted near-dups high, unrelated pairs absent") {
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs((0L, 2L)) == 1.0)            // exact dup
    assert(pairs((0L, 1L)) > 0.5)             // near dup
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)))
  }

  test("minhashPairs finds planted near-dups and skips unrelated docs") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text", shingleN = 5,
      k = 64, bands = 16, threshold = 0.4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) == 1.0)
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).nonEmpty &&
      Set(a, b) != Set(3L, 4L) || Set(a, b) == Set(3L, 4L) })
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val sh = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(0L, 2L) == 0)       // identical text -> identical simhash
    assert(ham(0L, 1L) <= 12)      // near-dup -> close
    assert(ham(0L, 3L) > 12)       // unrelated -> far
  }

  test("minhash est_jaccard approximates exact jaccard on fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 5)
      .where($"jaccard" >= 0.6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val est = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every high-jaccard pair is recalled by LSH with a close estimate
    exact.foreach { case (k, j) =>
      assert(est.contains(k), s"pair $k (jaccard $j) missed by minhash-LSH")
      assert(math.abs(est(k) - j) < 0.25, s"pair $k est ${est(k)} vs exact $j")
    }
  }
}
