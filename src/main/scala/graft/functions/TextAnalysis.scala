package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (builder brief §extensions):
  * tokenization stats, quality scoring, heuristic language-ID, document
  * fingerprinting. All pure Column expressions — codegen-friendly, no UDFs,
  * no shuffles until the caller aggregates — so they run per-row at scan
  * speed over 100 TB of text.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the BPE-ish regex path: split on runs of
    * whitespace; punctuation kept attached as in raw web text). */
  /** Strip ALL leading/trailing whitespace. Built-in `trim` strips only
    * ASCII spaces (in Spark AND the oracle engine), so \t/\n edges would
    * still diverge: Java split drops TRAILING empty strings but keeps
    * leading ones, while the oracle's regex split keeps both. The oracle
    * twin is `regexp_replace(x, '^\s+|\s+$', '', 'g')`. */
  def wsTrim(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  def tokens(text: Column): Column = split(wsTrim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def charCount(text: Column): Column = length(text)

  /** Mean token length — a classic quality signal. */
  def avgWordLen(text: Column): Column =
    (length(text) - tokenCount(text) + 1).cast("double") / tokenCount(text)

  /** Fraction of tokens in a stopword list — high for natural prose,
    * low for boilerplate/code/gibberish. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val hits = filter(tokens(text), t => t.isInCollection(stopwords))
    size(hits).cast("double") / tokenCount(text)
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      length(text)

  /** Composite quality score in [0,1]: blends stopword density, length
    * band, and word-length plausibility. Deterministic and SQL-expressible
    * so it can be oracle-checked; weights are heuristic. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val wordLen = avgWordLen(text)
    val wordScore = when(wordLen >= 3.0 && wordLen <= 10.0, 1.0).otherwise(0.0)
    lenScore * 0.4 + stopScore * 0.4 + wordScore * 0.2
  }

  /** Heuristic n-gram/marker language-ID: score = marker-token overlap per
    * language profile, argmax with a fixed precedence tie-break. Profiles
    * are tiny built-in stopword sets (public-knowledge frequency lists);
    * callers supply their own for more languages.
    */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit"))

  def langScores(text: Column, profiles: Seq[(String, Seq[String])]): Seq[(String, Column)] =
    profiles.map { case (lang, words) =>
      lang -> size(filter(tokens(text), t => t.isInCollection(words)))
    }

  /** Predicted language: argmax of profile scores; earlier profile wins
    * ties (deterministic). Score 0 everywhere → "unk". */
  def langId(text: Column, profiles: Seq[(String, Seq[String])] = defaultProfiles): Column = {
    val scores = langScores(text, profiles)
    def maxOf(cs: Seq[Column]): Column =
      if (cs.size == 1) cs.head else greatest(cs: _*)
    val best = scores.tail.foldLeft[Column](lit(scores.head._1)) { case (acc, (lang, s)) =>
      // strictly-greater keeps earlier profiles on ties
      when(s > maxOf(scores.takeWhile(_._1 != lang).map(_._2)), lang).otherwise(acc)
    }
    when(maxOf(scores.map(_._2)) === 0, "unk").otherwise(best)
  }

  /** TF-IDF per (doc, term): tf = term count / doc length, idf =
    * ln(N / docfreq). Three hash-shuffles (term counts, doc lengths, doc
    * freqs) + broadcast of the scalar corpus size — no driver loops, the
    * standard distributed formulation.
    */
  def tfidf(docs: org.apache.spark.sql.DataFrame, id: String,
            text: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, count, countDistinct, explode}
    val toks = docs.select(col(id).as("doc_id"),
      explode(tokens(col(text))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val dfreq = toks.groupBy("term").agg(countDistinct(col("doc_id")).as("doc_freq"))
    val nd = docs.agg(countDistinct(col(id)).as("nd"))
    tf.join(dl, "doc_id")
      .join(dfreq, "term")
      .join(broadcast(nd))
      .select(col("doc_id"), col("term"),
        (col("n").cast("double") / col("dl")).as("tf"),
        col("doc_freq"),
        ((col("n").cast("double") / col("dl")) *
          log(col("nd").cast("double") / col("doc_freq"))).as("tfidf"))
  }

  /** Exact content fingerprint: md5 of lowercased text. */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Bag fingerprint: md5 over the sorted distinct token set — invariant
    * to word order, the cheap "rolling-hash" dedup key. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text))))))
}
