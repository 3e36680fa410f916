package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.{Dedup, Similarity, TextAnalysis => TA}
import PipelineQueries.{QUALITY_SQL, Stopwords, TOKS}

/** Corpus-curation operators — the decisions a training-data pipeline
  * makes AFTER the per-document statistics exist: what to hold out
  * (decontamination), what to keep (quality top-p, semantic dedup), how
  * to cut documents into training rows (chunking), and how much of each
  * source to sample (mixture planning).
  *
  * Shares the tokenization ([[PipelineQueries.TOKS]]), quality formula
  * ([[PipelineQueries.QUALITY_SQL]]), hash family
  * ([[TA.hashBucket]]) and shingle pipeline ([[Dedup.shingles]]) with
  * the rest of the registry — one source of truth per primitive, so an
  * engine/oracle pair can never drift on a shared definition.
  */
object CurationQueries {

  private def par(df: DataFrame): DataFrame =
    graft.functions.Parallelism.ensureParallel(df)

  // ---- sliding-window chunking ----------------------------------------

  /** Tokens per chunk / tokens between chunk starts. Stride < size gives
    * the 10-token overlap that keeps passages intact across boundaries.
    * Spliced into BOTH the engine plan and the oracle SQL. */
  private val ChunkSize = 40
  private val ChunkStride = 30

  /** Sliding-window token chunking — the doc→training-row explosion step
    * (fixed token budget per row, overlapping windows so no passage is
    * split across a boundary unseen). Chunk starts are `0, stride,
    * 2·stride, …` while they index a token; the last chunk may be short.
    *
    * Scale shape: tokenize once per doc (the array is materialized below
    * the Generate, the [[Dedup.shinglesPos]] lesson), then a pure
    * per-row explode + slice — no shuffle anywhere, scan-speed at
    * 100 TB. Output grows ~len/stride rows per doc, the intended
    * fan-out. */
  def chunks(s: SparkSession, d: String): DataFrame =
    chunksOf(par(documents(s, d)))

  def chunksOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TA.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride)))
          .as("start"))
      .select(col("doc_id"),
        (col("start") / ChunkStride).cast("int").as("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(ChunkSize)))
          .as("chunk_text"),
        least(size(col("toks")) - col("start"), lit(ChunkSize))
          .cast("int").as("n_chunk_tokens"))

  // ---- quality top-p per language --------------------------------------

  /** Keep the top-`TopP` fraction by quality within each language — the
    * rank-based cut a mixing pipeline uses when absolute quality
    * thresholds would starve low-resource languages. percent_rank over
    * (quality DESC, doc_id ASC) is fully deterministic: the quality
    * doubles are bit-identical in both engines (q_text_quality's
    * established parity) and the id breaks ties totally.
    *
    * Scale shape: ONE hash-shuffle on `lang` + per-partition sort — the
    * standard window topology; with per-language skew the salted-window
    * variant in operators/Skew.scala applies. */
  private val TopP = 0.5

  def qualityTopP(s: SparkSession, d: String): DataFrame =
    qualityTopPOf(par(documents(s, d)))

  def qualityTopPOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        TA.qualityScore(col("text"), Stopwords).as("quality"))
      .withColumn("q_rank", percent_rank().over(
        Window.partitionBy("lang").orderBy(col("quality").desc, col("doc_id").asc)))
      .where(col("q_rank") <= TopP)

  // ---- mixture planning ------------------------------------------------

  /** Per-source mixture plan: document/token counts, the source's share
    * of corpus tokens, and the deterministic sampling rate that flattens
    * the mixture to uniform-by-source token mass (capped at 1 — a
    * source below its target cannot be upsampled by a filter).
    *
    * Scale shape: one map-side-combined groupBy(source); the unpartitioned
    * window runs over the AGGREGATED frame — one row per source, driver-
    * scale cardinality — never over raw documents. */
  def mixPlan(s: SparkSession, d: String): DataFrame =
    mixPlanOf(par(documents(s, d)))

  def mixPlanOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy() // post-agg frame: |sources| rows
    docs
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TA.tokenCount(col("text"))).as("n_tokens"))
      .withColumn("total_tokens", sum(col("n_tokens")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens"))
          .as("token_share"),
        least(lit(1.0),
          col("total_tokens").cast("double") / (col("n_sources") * col("n_tokens")))
          .as("sampling_rate"))
  }

  // ---- benchmark decontamination ---------------------------------------

  /** Hash bucket (mod [[BenchBuckets]]) whose documents form the held-out
    * "benchmark" set — the same md5 family as q_hash_split, so
    * membership is deterministic and engine-independent. */
  private val BenchBuckets = 16
  private val BenchBucket = 15

  /** Benchmark decontamination: flag training documents that share any
    * 5-token shingle with the held-out set — the n-gram-overlap check
    * every serious pre-training pipeline runs against its eval suites
    * (the industry norm is 8–13-gram; the fixture docs are short, so the
    * registry uses the corpus-wide n=5 shingle pipeline every other
    * dedup operator shares). Output: one row per CONTAMINATED train doc
    * with its distinct-shingle count, hit count, and hit fraction.
    *
    * Scale shape: the benchmark side of the join is the held-out suite —
    * small by construction (eval sets are MBs against a 100 TB corpus) —
    * so its distinct shingles BROADCAST and the train side never
    * shuffles for the probe; the per-doc counts then aggregate on one
    * doc_id hash-shuffle of (doc, shingle) pairs with map-side partial
    * counts. */
  def decontaminate(s: SparkSession, d: String): DataFrame =
    decontaminateOf(par(documents(s, d)))

  def decontaminateOf(docs: DataFrame): DataFrame = {
    val sh = Dedup.shingles(docs, "doc_id", "text", 5)
      .withColumn("bucket", TA.hashBucket(col("doc_id"), BenchBuckets))
    val bench = sh.where(col("bucket") === BenchBucket)
      .select("shingle").distinct()
    sh.where(col("bucket") =!= BenchBucket)
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("shingle"), "left")
      .groupBy("doc_id")
      // count(lit) = all distinct shingles; count(hit) skips the nulls
      // the left join leaves on unmatched shingles
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_hits"))
      .where(col("n_hits") > 0)
      .select(col("doc_id"), col("n_shingles"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_shingles")).as("contam_frac"))
  }

  // ---- semantic dedup --------------------------------------------------

  /** SemDeDup over the embedding corpus — [[Similarity.semDedup]] with
    * the oracle-parity width guard (the generated SQL unrolls
    * [[Similarity.OracleDim]]-wide cosine chains). */
  def semDedupQ(s: SparkSession, d: String): DataFrame =
    Similarity.semDedup(
      embeddings(s, d).withColumn("embedding",
        Similarity.requireWidth(col("embedding"))),
      "vec_id", "embedding")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_chunk"         -> (chunks _),
    "q_quality_topp"  -> (qualityTopP _),
    "q_mix_plan"      -> (mixPlan _),
    "q_decontaminate" -> (decontaminate _),
    "q_semdedup"      -> (semDedupQ _))

  val oracle: Map[String, String] = Map(
    // range(0, len, stride) enumerates the same starts as the engine's
    // sequence(0, len-1, stride): every multiple of stride that indexes
    // a token; list slices clip at the end in both engines
    "q_chunk" ->
      s"""WITH toks AS (SELECT doc_id, $TOKS AS t FROM documents),
         |st AS (SELECT doc_id, t, unnest(range(0, len(t), $ChunkStride)) AS start FROM toks)
         |SELECT doc_id,
         |  CAST(start // $ChunkStride AS INTEGER) AS chunk_idx,
         |  array_to_string(t[start + 1 : start + $ChunkSize], ' ') AS chunk_text,
         |  CAST(least(len(t) - start, $ChunkSize) AS INTEGER) AS n_chunk_tokens
         |FROM st""".stripMargin,
    "q_quality_topp" ->
      s"""WITH q AS (SELECT doc_id, lang, $QUALITY_SQL AS quality FROM documents),
         |r AS (SELECT doc_id, lang, quality,
         |        percent_rank() OVER (PARTITION BY lang
         |                             ORDER BY quality DESC, doc_id ASC) AS q_rank
         |      FROM q)
         |SELECT doc_id, lang, quality, q_rank FROM r WHERE q_rank <= $TopP""".stripMargin,
    // sum(BIGINT) is HUGEINT in DuckDB — cast back at each level so the
    // arithmetic runs in the same int64/double domains as the engine
    "q_mix_plan" ->
      s"""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(len($TOKS)) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY source),
         |w AS (SELECT source, n_docs, n_tokens,
         |        CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens,
         |        count(*) OVER () AS n_sources
         |      FROM s)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / total_tokens AS token_share,
         |  least(CAST(1 AS DOUBLE),
         |        CAST(total_tokens AS DOUBLE) / (n_sources * n_tokens)) AS sampling_rate
         |FROM w""".stripMargin,
    // same toks/pos CTEs as every shingle oracle; benchmark membership
    // is the q_hash_split md5 bucket of the doc id
    "q_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $TOKS AS t FROM documents),
         |pos AS (SELECT doc_id, t, unnest(range(len(t)-4)) AS i FROM toks WHERE len(t) >= 5),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i+1:i+5], ' ') AS shingle,
         |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         |           % $BenchBuckets AS bucket
         |       FROM pos),
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE bucket = $BenchBucket),
         |j AS (SELECT t.doc_id, bench.shingle AS hit
         |      FROM sh t LEFT JOIN bench ON t.shingle = bench.shingle
         |      WHERE t.bucket <> $BenchBucket)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(count(hit) AS BIGINT) AS n_hits,
         |  CAST(count(hit) AS DOUBLE) / count(*) AS contam_frac
         |FROM j GROUP BY doc_id HAVING count(hit) > 0""".stripMargin,
    "q_semdedup" -> Similarity.semDedupOracleSql())
}
