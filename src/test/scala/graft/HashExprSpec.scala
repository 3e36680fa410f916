package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, ElementwiseAgg, Md5Long60, MinhashHashes, NearestCentroid, SimhashVotes}

/** Native hash/assignment expressions vs their built-in compositions:
  * the fused fast paths must be BIT-IDENTICAL to the formulations the
  * DuckDB oracles replicate.
  */
class HashExprSpec extends SparkSpec {
  import spark.implicits._

  private def textFixture = Tables.documents(spark, sf0001)
    .select($"doc_id", $"text").limit(200)

  test("Md5Long60 equals conv(substring(md5,1,15),16,10) bit-for-bit") {
    val diff = textFixture.select(
        Md5Long60($"text").as("fast"),
        conv(substring(md5($"text"), 1, 15), 16, 10).cast("long").as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() === 0)
    // value range: always non-negative, < 2^60
    val mx = textFixture.select(max(Md5Long60($"text"))).head().getLong(0)
    val mn = textFixture.select(min(Md5Long60($"text"))).head().getLong(0)
    assert(mn >= 0L && mx < (1L << 60))
  }

  test("MinhashHashes equals the per-coefficient arithmetic composition") {
    val (as, bs) = Dedup.universalCoeffs(8)
    val ref = array((0 until 8).map(i =>
      (lit(as(i)) * (Md5Long60($"text") % Dedup.P) + lit(bs(i))) % Dedup.P): _*)
    val diff = textFixture.select(
        MinhashHashes($"text", as, bs, Dedup.P).as("fast"), ref.as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() === 0)
  }

  test("SimhashVotes equals the per-bit when/shiftright composition") {
    val bits = 12
    val ref = array((0 until bits).map(b =>
      when(shiftright(Md5Long60($"text"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)): _*)
    val diff = textFixture.select(
        SimhashVotes($"text", bits).as("fast"), ref.as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() === 0)
  }

  test("wsTrim strips ALL edge whitespace so tokenization has no empty tokens") {
    import graft.functions.{TextAnalysis => TA}
    val df = Seq("\tfoo bar\n", "  foo bar  ", "foo bar", "\n", "").toDF("text")
      .select(TA.tokens($"text").as("toks"))
    val got = df.collect().map(_.getSeq[String](0).toList)
    assert(got(0) === List("foo", "bar"))
    assert(got(1) === List("foo", "bar"))
    assert(got(2) === List("foo", "bar"))
    // whitespace-only and empty text both collapse to a single empty
    // token (Java split of "" yields [""]), identically to the oracle's
    // regex split of the trimmed text
    assert(got(3) === List("") && got(4) === List(""))
    // simhash of texts differing only in edge whitespace is identical
    val h = graft.functions.Dedup.simhash(
      Seq((1L, "alpha beta\n"), (2L, "alpha beta"), (3L, "\t alpha beta "))
        .toDF("doc_id", "text"), "doc_id", "text")
      .select("simhash").as[Long].collect()
    assert(h.distinct.length === 1)
  }

  test("null input propagates null through all three expressions") {
    val df = Seq(Option.empty[String], Some("x")).toDF("t")
    val (as, bs) = Dedup.universalCoeffs(4)
    val r = df.select(
      Md5Long60($"t").as("a"),
      MinhashHashes($"t", as, bs, Dedup.P).as("b"),
      SimhashVotes($"t", 4).as("c")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1) && r(0).isNullAt(2))
    assert(!r(1).isNullAt(0) && !r(1).isNullAt(1) && !r(1).isNullAt(2))
  }

  test("elementwiseDoubleSum matches posexplode + per-position sum") {
    val v = Tables.embeddings(spark, sf0001).limit(100)
      .select($"label", transform($"embedding", _.cast("double")).as("v"))
    val fast = v.groupBy("label")
      .agg(ElementwiseAgg.elementwiseDoubleSum($"v", 64).as("s"))
      .select($"label", posexplode($"s").as(Seq("pos", "x")))
    val ref = v.select($"label", posexplode($"v").as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum($"x").as("x"))
    val joined = fast.as("f").join(ref.as("r"), Seq("label", "pos"))
      .where(abs($"f.x" - $"r.x") > 1e-9)
    assert(joined.count() === 0)
  }

  test("NearestCentroid picks argmax cosine with ties to lower id") {
    val cents = Array(
      Array(1.0, 0.0),
      Array(0.0, 1.0),
      Array(1.0, 0.0)) // duplicate of centroid 1 → tie resolves to id 1
    val df = Seq(
      (1L, Seq(2.0f, 0.1f)),   // closest to (1,0) → cid 1 (not the dup 3)
      (2L, Seq(0.1f, 3.0f)),   // closest to (0,1) → cid 2
      (3L, Seq(-1.0f, -1.0f))  // equidistant-ish: cos with c1 = c2 → cid 1
    ).toDF("id", "v")
    val got = df.select($"id", NearestCentroid($"v", cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 1 && got(2L) === 2 && got(3L) === 1)
  }
}
