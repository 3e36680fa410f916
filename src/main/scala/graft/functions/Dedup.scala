package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines: exact (hash-groupBy),
  * n-gram Jaccard, MinHash+LSH banding, and SimHash. All fully
  * distributed: the only shuffles are hash-partitioned groupBys/joins on
  * content-derived keys — no driver-side pair enumeration, so the same
  * plans run at 100 TB (candidate generation is bucket-local; the O(n²)
  * pair space is never materialized, only same-bucket/same-shingle pairs).
  */
object Dedup {

  /** Exact dedup via content hash: one representative (min id) + group
    * size per distinct content. A single hash-shuffle on the fingerprint. */
  def exactGroups(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(lower(col(text))).as("fp"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Corpus dedup keeping full rows: for each distinct content, the row
    * with the smallest id survives. One window over the content hash —
    * the operation a training-data pipeline actually runs. */
  def dedupKeepRows(df: DataFrame, id: String, text: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(col(text)))).orderBy(col(id).asc)
    df.withColumn("_ddk_rn", row_number().over(w))
      .where(col("_ddk_rn") === 1)
      .drop("_ddk_rn")
  }

  /** (doc, shingle) pairs (NOT deduplicated): `n`-token shingles from a
    * whitespace tokenization. Explode is linear in corpus token count. */
  def shinglesRaw(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val toks = split(col(text), "\\s+")
    df.where(size(toks) >= n)
      .select(col(id).as("doc_id"),
        explode(sequence(lit(0), size(toks) - n)).as("i"),
        toks.as("toks"))
      .select(col("doc_id"), concat_ws(" ", slice(col("toks"), col("i") + 1, lit(n))).as("shingle"))
  }

  /** Distinct (doc, shingle) pairs — set semantics for Jaccard. */
  def shingles(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    shinglesRaw(df, id, text, n).distinct()

  /** Exact n-gram Jaccard for every pair sharing ≥1 shingle. The join is
    * keyed on the shingle string (skew-safe for natural text; a hot
    * boilerplate shingle can be salted upstream), so only co-shingled
    * pairs are ever formed — never the full cross product.
    *
    * Cache ownership: this operator (and [[minhashPairs]]) caches its
    * shingle/signature intermediates for the multiple self-join scans;
    * the cache lives until the session drops it. Long-lived sessions
    * batching many corpora should `spark.catalog.clearCache()` between
    * runs (graft.Verify does). */
  def jaccardPairs(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val sh = shingles(df, id, text, n).cache()
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared"))).as("jaccard"))
  }

  /** MinHash signatures: the shingle string is hashed ONCE (xxhash64);
    * the `k` independent functions are cheap 64-bit re-hashes of that
    * value — 1 string hash + k fixed-width hashes per shingle instead of
    * k string hashes. Duplicate shingles need no pre-distinct: min over
    * the multiset equals min over the set, saving a full shuffle. One
    * shuffle total (groupBy doc with partial aggregation). */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val base = sh.select(col("doc_id"), xxhash64(col("shingle")).as("h0"))
    val mins = (0 until k).map(i => min(xxhash64(col("h0"), lit(i))).as(s"h$i"))
    base.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash+LSH near-dup candidates: signatures banded into `bands`
    * groups of `k/bands` rows; docs colliding in any band become
    * candidates; candidates verified by exact Jaccard estimate from the
    * full signature. Returns (doc_a, doc_b, est_jaccard ≥ `threshold`).
    *
    * Scale path: candidate generation is a groupBy on (band, bandHash) —
    * cost proportional to collisions, not n².
    */
  def minhashPairs(df: DataFrame, id: String, text: String,
                   shingleN: Int = 5, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5): DataFrame = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"minhashPairs needs bands in [1,k] dividing k (k=$k, bands=$bands): " +
        "bands>k would hash zero signature rows per band — every doc " +
        "collides and the candidate join degenerates to n^2")
    val rows = k / bands
    val sigs = minhashSignatures(shinglesRaw(df, id, text, shingleN), k).cache()
    val banded = sigs.select(col("doc_id"), posexplode(
      array((0 until bands).map(b =>
        xxhash64(lit(b), concat_ws(",", (0 until rows).map(r => col("sig")(b * rows + r)): _*))): _*))
      .as(Seq("band", "band_hash")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash over tokens: per bit, sum ±1 weighted by token hash
    * bit; sign vector packed into a long. One groupBy per doc. */
  def simhash(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id).as("doc_id"),
      explode(split(lower(col(text)), "\\s+")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Hamming distance between two packed 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
