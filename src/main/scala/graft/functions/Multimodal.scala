package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus batch feature extraction.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs — builder brief): `fakeDecodeFeatures`
  * derives a fixed-size float vector from the raw bytes. Everything
  * Spark-side is real and tested: the schema, the binary column handling,
  * the `mapPartitions` batch shape (the Scala analog of `mapInPandas` —
  * per-partition iteration so a real decoder would amortize model/codec
  * init across rows), and the partitioning story (binary payloads stay
  * where they are; only extracted features shuffle).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("blob", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("codec", StringType))))))

  /** Synthesize a media table from a text corpus: bytes = UTF-8 payload,
    * metadata derived deterministically. Stands in for real scraped media
    * at identical schema/plumbing. */
  def synthesizeMedia(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).as("media_id"),
      when(col(id) % 3 === 0, "image").when(col(id) % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col(text), "UTF-8").as("blob"),
      struct(
        (length(col(text)) * 37 % 1920 + 1).cast(IntegerType).as("width"),
        (length(regexp_replace(col(text), " ", "")) * 17 % 1080 + 1)
          .cast(IntegerType).as("height"),
        lit("stub").as("codec")).as("meta"))

  /** Expression-only metadata pass: byte length + content hash — the part
    * of media handling that needs no codec. */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("media_type"),
      octet_length(col("blob")).as("byte_len"),
      md5(col("blob")).as("content_md5"),
      col("meta.width").as("width"), col("meta.height").as("height"))

  /** STUB decoder ??? — stands in for image decode / audio resample /
    * frame sampling. Deterministic fake: `dim` features from rolling byte
    * sums. A real implementation would replace ONLY the inner function;
    * the batch shape (mapPartitions: per-partition init, row iteration,
    * fixed-size float output) is the production plumbing. */
  def fakeDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Frame sampling STUB ??? — stands in for video frame extraction:
    * emits `n` evenly-spaced "frames" (byte slices) per video row, one
    * output row per frame. The real plumbing demonstrated: a generator
    * (posexplode) over per-row derived arrays, keyed output
    * (media_id, frame_idx, frame blob) — swap the slicer for a codec and
    * the plan is unchanged. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val len = octet_length(col("blob"))
    val span = greatest(len / n, lit(1))
    // exactly n frames per row — keyed completeness (media_id × frame_idx)
    // is the contract; frames past a short blob's end are empty rather
    // than silently missing
    media.where(col("media_type") === "video")
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("blob"), (i * span + 1).cast("int"), span.cast("int"))))
          .as(Seq("frame_idx", "frame")))
  }

  /** Resize-metadata STUB: recompute target dimensions preserving aspect
    * ratio — the expression-only half of a resize (the pixel work lives
    * behind the decode boundary). */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = least(lit(maxSide) / greatest(w, h).cast("double"), lit(1.0))
    // floor at 1: extreme aspect ratios (1919x1) would otherwise round
    // a dimension to 0
    media.select(col("media_id"), w.as("width"), h.as("height"),
      greatest(lit(1), round(w * scale).cast("int")).as("out_width"),
      greatest(lit(1), round(h * scale).cast("int")).as("out_height"))
  }

  /** Integer twin of [[fakeDecodeFeatures]]: per-bucket byte sums with no
    * float rounding — the verification projection. `sums(i) = Σ bytes[j]
    * for j ≡ i (mod dim)` is exact int64 arithmetic an external oracle
    * can recompute from the payload, where the float features (sequential
    * f32 rounding) cannot be replicated bit-for-bit engine-to-engine. */
  def byteSumFeatures(bytes: Array[Byte], dim: Int): Array[Long] = {
    val out = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    out
  }

  /** [[extractFeatures]] with the integer-sum decode twin, exploded to
    * one scalar row per (media, feature position) — comparator-friendly
    * (no array-typed output column) and exactly oracle-checkable. Same
    * mapPartitions batch plumbing as the float path. */
  def extractFeatureSums(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("feat_sums", ArrayType(LongType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(idIdx), r.getString(typeIdx),
          byteSumFeatures(r.getAs[Array[Byte]](blobIdx), dim).toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
      .select(col("media_id"), col("media_type"),
        posexplode(col("feat_sums")).as(Seq("pos", "feat_sum")))
  }

  /** Batch feature extraction over the binary column. Output schema:
    * (media_id, media_type, features array<float>). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = media.schema.fieldIndex("media_id")
    val typeIdx = media.schema.fieldIndex("media_type")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      // per-partition init happens here in a real decoder (codec/model)
      rows.map { r =>
        Row(r.getLong(idIdx), r.getString(typeIdx),
          fakeDecodeFeatures(r.getAs[Array[Byte]](blobIdx), dim).toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
