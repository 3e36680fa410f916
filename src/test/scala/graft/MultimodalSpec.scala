package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

/** Binary-column plumbing: schema, deterministic stub decode, batch
  * shape. The decode itself is a stub (no codecs in-container); what's
  * verified is the Spark-side contract a real decoder would slot into.
  */
class MultimodalSpec extends SparkSpec {

  test("synthesizeMedia produces typed binary + metadata schema") {
    val media = Multimodal.synthesizeMedia(
      Tables.documents(spark, sf0001), "doc_id", "text")
    assert(media.schema("blob").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val r = media.head()
    assert(r.getAs[Array[Byte]]("blob").nonEmpty)
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getInt(0) >= 1 && meta.getInt(0) <= 1920)
  }

  test("sampleFrames: n byte-slice frames per video row; resizeMeta keeps aspect") {
    val media = Multimodal.synthesizeMedia(
      Tables.documents(spark, sf0001), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, 4)
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.where(col("count") =!= 4).count() == 0)
    assert(frames.schema("frame").dataType.typeName == "binary")
    val resized = Multimodal.resizeMeta(media, 256)
    val bad = resized.where(
      greatest(col("out_width"), col("out_height")) > 256 ||
        col("out_width") < 1 || col("out_height") < 1 ||
        (col("width") <= 256 && col("height") <= 256 &&
          (col("out_width") =!= col("width") || col("out_height") =!= col("height"))))
    assert(bad.count() == 0)
  }

  test("extractFeatures: fixed-size float vectors, deterministic") {
    val media = Multimodal.synthesizeMedia(
      Tables.documents(spark, sf0001), "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").limit(3).collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").limit(3).collect()
    f1.zip(f2).foreach { case (a, b) =>
      val va = a.getSeq[Float](2); val vb = b.getSeq[Float](2)
      assert(va.length == 16 && va == vb)
    }
    // feature energy reflects byte count: longer doc -> larger L1 mass
    val sums = Multimodal.extractFeatures(media, dim = 16)
      .select(col("media_id"), aggregate(col("features"),
        lit(0.0), (acc, x) => acc + x).as("l1"))
      .join(media.select(col("media_id"), octet_length(col("blob")).as("len")), "media_id")
    val c = sums.agg(corr(col("l1"), col("len"))).head().getDouble(0)
    assert(c > 0.99, s"feature mass should track byte length, corr=$c")
  }
}
