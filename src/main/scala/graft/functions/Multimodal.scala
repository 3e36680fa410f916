package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for LLM-data pipelines: media as opaque
  * `binary` columns with typed metadata, plus batch feature extraction.
  *
  * IMAGE decode is REAL ([[decodeImage]]/[[imageStats]] —
  * `javax.imageio`'s JDK-built-in PNG/JPEG/GIF/BMP readers, no external
  * codec needed), so is AUDIO ([[decodeAudio]]/[[audioStats]] —
  * `javax.sound.sampled`'s JDK-built-in WAV/AIFF/AU readers), and so is
  * VIDEO CONTAINER METADATA ([[decodeVideoMeta]]/[[videoStats]] — a
  * dependency-free MP4 `moov`/`mvhd`/`tkhd` box walk and AVI `avih`
  * header parse: duration, dimensions, track count), and so is
  * PIXEL-level frame decode ([[extractAviFrames]]/[[frameStats]] — the
  * RIFF `movi` chunk walk feeding the JDK's image readers: complete
  * BMPs and headerless DIBs ([[wrapDibFrame]]) through the BMP reader
  * — exact pixels, oracle-checked by `q_multimodal_pixels` — and MJPEG
  * `..dc` frames, a COMPRESSED intra-frame codec, through the JPEG
  * reader, oracle-checked by `q_multimodal_mjpeg`). Only INTER-frame
  * codec rasterization (H.264/VP9…) remains a clearly-marked
  * deterministic STUB (`fakeDecodeFeatures`/[[sampleFrames]]'s byte
  * slicing — the container ships no such codec, builder brief), with
  * undecodable bytes falling back to the stub path so one plan serves
  * a mixed corpus. Everything Spark-side is real and tested: the
  * schema, the binary column handling, the `mapPartitions` batch shape
  * (the Scala analog of `mapInPandas` — per-partition iteration so a
  * decoder amortizes codec/model init across rows), and the
  * partitioning story (binary payloads stay where they are; only
  * extracted features shuffle).
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

  /** STUB decoder ??? — stands in for pixel/sample-level feature
    * extraction, the one remaining codec gap now that image
    * ([[decodeImage]]), audio ([[decodeAudio]]) and video container
    * metadata ([[decodeVideoMeta]]) are real. Deterministic fake: `dim`
    * features from rolling byte sums. A real implementation would
    * replace ONLY the inner function; the batch shape (mapPartitions:
    * per-partition init, row iteration, fixed-size float output) is the
    * production plumbing. */
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

  /** REAL image decode — `javax.imageio` ships PNG/JPEG/GIF/BMP readers
    * in the JDK, so this needs no external codec: bytes → (width,
    * height, channels, per-channel means in [0,1]). None for bytes no
    * installed reader accepts — callers fall back to the stub path so
    * non-image payloads keep flowing through the same plumbing.
    * Channel means walk the ARGB int per pixel (O(w·h), the decode
    * itself already paid that); alpha is reported as a 4th channel when
    * the color model carries one. */
  /** ImageIO's default ImageInputStream spools through a DISK-backed
    * scratch file per read — measured as the dominant cost of small-
    * frame decodes under thread parallelism (temp-file create/delete
    * per frame). A heap-backed [[javax.imageio.stream.MemoryCacheImageInputStream]]
    * PER DECODE avoids it without flipping the process-global
    * `ImageIO.setUseCache` flag (which would change behavior for every
    * other ImageIO user co-resident in the executor JVM). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Double])] = {
    if (bytes == null) return None
    val img =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      // NonFatal, not just IOException: the JDK readers throw
      // RuntimeExceptions (AIOOBE, NegativeArraySize, CMMException…) on
      // malformed containers, and "undecodable falls back to the stub"
      // must hold for those too — a corrupt row must not kill the job
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w <= 0 || h <= 0) return None
    val hasAlpha = img.getColorModel.hasAlpha
    val sums = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val argb = img.getRGB(x, y)
        sums(0) += (argb >>> 16) & 0xff
        sums(1) += (argb >>> 8) & 0xff
        sums(2) += argb & 0xff
        sums(3) += (argb >>> 24) & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h * 255L
    val ch = if (hasAlpha) 4 else 3
    Some((w, h, ch, Array.tabulate(ch)(i => sums(i).toDouble / n)))
  }

  /** PERCEPTUAL image hash (dHash, the difference-hash family every
    * image-dedup pipeline starts with): exact AREA-AVERAGE downsample
    * to a (dw+1)×dh gray grid, bit (y·dw + x) set iff cell (x+1, y)
    * is brighter than cell (x, y). Near-duplicate images — recompressed,
    * resized, slightly edited — keep most bits, so Hamming distance is
    * the image-side near-dup key ([[phashPairs]] banding; the text
    * side's SimHash discipline).
    *
    * DETERMINISM is engineered, not assumed: the downsample is integer
    * pixel-sum binning (`cy = y·dh/h`), never a platform-resampler
    * (Graphics2D interpolation differs across JVMs), and the
    * brightness comparison cross-multiplies integer sums
    * (`sumA·cntB > sumB·cntA`) so no float rounding can flip a bit —
    * for byte-exact decoders (BMP/PNG) the hash is a pure function of
    * the pixels, which is what lets `q_multimodal_phash` oracle it in
    * closed form. Images smaller than the grid (w ≤ dw, h < dh) have
    * no defined cells → None (the fallback row). */
  def dHash(bytes: Array[Byte], dw: Int = 8, dh: Int = 8): Option[Long] = {
    if (bytes == null) return None
    val img =
      try javax.imageio.ImageIO.read(
        new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < dw + 1 || h < dh) return None
    val sums = Array.ofDim[Long](dh, dw + 1)
    val cnts = Array.ofDim[Long](dh, dw + 1)
    var y = 0
    while (y < h) {
      val cy = y * dh / h
      var x = 0
      while (x < w) {
        val cx = x * (dw + 1) / w
        val argb = img.getRGB(x, y)
        sums(cy)(cx) += ((argb >>> 16) & 0xff) + ((argb >>> 8) & 0xff) +
          (argb & 0xff)
        cnts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < dh) {
      var cx = 0
      while (cx < dw) {
        if (sums(cy)(cx + 1) * cnts(cy)(cx) > sums(cy)(cx) * cnts(cy)(cx + 1))
          hash |= 1L << (cy * dw + cx)
        cx += 1
      }
      cy += 1
    }
    Some(hash)
  }

  /** Per-image dHash through the same `mapPartitions` codec boundary as
    * [[imageStats]]: decodable blobs emit their 64-bit perceptual hash
    * (`decoded = true`), everything else a zero-hash fallback row. */
  def imagePhash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("phash", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        dHash(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(hv) => Row(r.getLong(idIdx), true, hv)
          case None => Row(r.getLong(idIdx), false, 0L)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Image NEAR-DUP candidate pairs from perceptual hashes — the
    * [[graft.functions.Dedup.simhash]] banding discipline on the image
    * side: the 64-bit hash splits into four 16-bit bands; two images
    * whose Hamming distance is ≤ 3 agree on at least ONE whole band
    * (pigeonhole over 4 bands), so candidates come from equal-band
    * buckets — never an all-pairs self-join — and the exact
    * `bit_count(a XOR b)` verify keeps only true near-dups. Input:
    * (media_id, phash) rows; output (id_a, id_b, hamming), id_a < id_b.
    *
    * Undecodable images: [[imagePhash]] emits `phash = 0, decoded =
    * false` fallback rows, which would collide in ALL four bands and
    * pair every unreadable blob with every other at hamming 0 — so when
    * the input carries the `decoded` column it is filtered here; inputs
    * without the column are trusted to be pre-filtered hash rows. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3,
                 maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming <= 3,
      "4-band LSH guarantees recall only for hamming <= 3; re-band for more")
    val decodedOnly =
      if (hashes.columns.contains("decoded")) hashes.where(col("decoded"))
      else hashes
    val banded0 = decodedOnly.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // degenerate-bucket cap (the minhash miners' maxBucket, on the
    // image side): a band bucket holding more members than any organic
    // near-dup clique is a template flood, and joining it costs
    // |bucket|^2 — drop those buckets whole (semi-join against the
    // under-cap bucket keys). None expands every bucket.
    val banded = maxBucket.fold(banded0) { m =>
      banded0.join(
        banded0.groupBy("band", "key").agg(count(lit(1)).as("__n"))
          .where(col("__n") <= m).select("band", "key"),
        Seq("band", "key"), "left_semi")
    }
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Image statistics through the SAME `mapPartitions` decode boundary
    * as [[extractFeatures]] — but with the REAL decoder in front:
    * decodable blobs report actual dimensions and channel means
    * (`decoded = true`), everything else falls back to the synthesized
    * metadata + whole-blob byte mean (`decoded = false`), so one plan
    * serves a mixed corpus of real images and opaque payloads. This is
    * the production shape the stub always stood in for: swap
    * granularity is the inner function, the plan is unchanged. */
  def imageStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      // a real deployment would init shared decoder state here, once
      // per partition — ImageIO readers are static, so nothing to do
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        decodeImage(bytes) match {
          case Some((w, h, ch, means)) =>
            Row(r.getLong(idIdx), true, w, h, ch,
              means(0), means(1), means(2))
          case None =>
            val meta = r.getStruct(metaIdx)
            val mean =
              if (bytes == null || bytes.isEmpty) 0.0
              else bytes.map(b => (b & 0xff).toLong).sum.toDouble /
                (bytes.length * 255.0)
            Row(r.getLong(idIdx), false,
              meta.getInt(0), meta.getInt(1), 0, mean, mean, mean)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Canonical-WAV fast path (r17): parse plain RIFF/WAVE PCM
    * (audioFormat 1, 16-bit → signed little-endian, 8-bit → unsigned,
    * per the WAV spec — exactly what the JDK's WAVE reader reports for
    * these files) WITHOUT `AudioSystem.getAudioInputStream`. The JDK
    * entry point walks the provider registry under a GLOBAL lock per
    * call; with 32 concurrent decode tasks the lock convoy serialized
    * the whole audio stage (measured ~50 task-seconds for 5 000 16 KB
    * WAVs whose actual byte work is ~1.6 s). Anything structurally in
    * doubt — wrong magic, non-PCM format tag (incl. EXTENSIBLE), odd
    * bit depths, malformed chunk walk — returns None and the caller
    * falls back to the JDK path, so coverage is unchanged and the fast
    * path is byte-equivalent where it applies (`MultimodalSpec` pins
    * fast ≡ AudioSystem on PCM16 mono/stereo and PCM8).
    * Returns (sampleRate, channels, bitsPerSample, pcm data slice) —
    * frames/normalization left to the callers so both consumers keep
    * their existing arithmetic. */
  private def pcmWavChunks(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 44) return None
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    def le32(o: Int): Long =
      ((bytes(o + 3) & 0xffL) << 24) | ((bytes(o + 2) & 0xffL) << 16) |
        ((bytes(o + 1) & 0xffL) << 8) | (bytes(o) & 0xffL)
    def le16(o: Int): Int = ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtSeen = false
    var rate = 0; var ch = 0; var bits = 0
    var data: Array[Byte] = null
    while (off + 8 <= bytes.length && data == null) {
      val id = tag(off)
      val len = le32(off + 4)
      val start = off + 8
      // validate EVERY chunk's declared length against the bytes present
      // (r17 ADVICE): le32 is unsigned so `len` is 0..2^32-1 — a declared
      // length in [2^31, 2^32) would make `len.toInt` negative below and
      // stall or reverse the walk on a crafted/corrupt blob. Bounding by
      // the remaining bytes both rejects truncated chunks (JDK-path
      // parity, as the data-chunk case always did) and guarantees
      // len.toInt == len ≥ 0, so `off` strictly advances by ≥ 8.
      if (len > bytes.length - start) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val audioFormat = le16(start)
        ch = le16(start + 2)
        rate = le32(start + 4).toInt
        bits = le16(start + 14)
        if (audioFormat != 1 || ch <= 0 || rate <= 0 ||
            (bits != 8 && bits != 16)) return None
        fmtSeen = true
      } else if (id == "data") {
        // a truncated data chunk (declared length beyond the bytes
        // present) already returned None above: the JDK reader reports
        // the DECLARED frame count there, and parity matters more than
        // speed on malformed rows
        if (!fmtSeen) return None
        val frameBytes = ch * (bits / 8)
        val usable = len.toInt - (len.toInt % frameBytes)
        if (usable < 0) return None
        data = java.util.Arrays.copyOfRange(bytes, start, start + usable)
      }
      // RIFF chunks are word-aligned: odd lengths carry a pad byte
      off = start + len.toInt + (len.toInt & 1)
    }
    if (data == null) None else Some((rate, ch, bits, data))
  }

  /** REAL audio decode — `javax.sound.sampled` ships WAV/AIFF/AU
    * readers in the JDK, so this needs no external codec: bytes →
    * (sample rate, channels, frames, duration seconds, RMS amplitude
    * in [0,1]). None for bytes no installed reader accepts or PCM
    * encodings outside the JDK's common set (8-bit signed/unsigned,
    * 16-bit signed either endianness) — callers fall back to the stub
    * path, mirroring [[decodeImage]]. RMS walks every sample of every
    * channel normalized to [-1,1]; O(frames·channels), the decode
    * already streamed those bytes. Canonical PCM WAVs take
    * [[pcmWavChunks]] (same arithmetic, no registry lock). */
  def decodeAudio(bytes: Array[Byte]): Option[(Float, Int, Long, Double, Double)] = {
    pcmWavChunks(bytes) match {
      case Some((rate, ch, bits, data)) =>
        val frameBytes = ch * (bits / 8)
        val frames = (data.length / frameBytes).toLong
        if (frames <= 0) return None
        var sumSq = 0.0
        var count = 0L
        if (bits == 16) {
          var i = 0
          while (i + 1 < data.length) {
            val s = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            val x = s / 32768.0
            sumSq += x * x; count += 1; i += 2
          }
        } else {
          var i = 0
          while (i < data.length) {
            val x = ((data(i) & 0xff) - 128) / 128.0
            sumSq += x * x; count += 1; i += 1
          }
        }
        val rms = if (count == 0) 0.0 else math.sqrt(sumSq / count)
        return Some((rate.toFloat, ch, frames, frames.toDouble / rate, rms))
      case None => // not canonical PCM WAV — JDK readers below
    }
    if (bytes == null) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      // NonFatal like the image path: malformed containers throw
      // RuntimeExceptions from the JDK parsers; a corrupt row must not
      // kill the job
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val frames = ais.getFrameLength
      val sr = fmt.getSampleRate
      val ch = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val enc = fmt.getEncoding
      if (frames <= 0 || sr <= 0 || ch <= 0) return None
      val signed16 = enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16
      val signed8 = enc == AudioFormat.Encoding.PCM_SIGNED && bits == 8
      val unsigned8 = enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
      if (!signed16 && !signed8 && !unsigned8) return None
      val data = {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = ais.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = ais.read(chunk) }
        buf.toByteArray
      }
      var sumSq = 0.0
      var count = 0L
      if (signed16) {
        val big = fmt.isBigEndian
        var i = 0
        while (i + 1 < data.length) {
          val s =
            if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
            else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
          val x = s / 32768.0
          sumSq += x * x; count += 1; i += 2
        }
      } else {
        var i = 0
        while (i < data.length) {
          val x =
            if (signed8) data(i) / 128.0
            else ((data(i) & 0xff) - 128) / 128.0
          sumSq += x * x; count += 1; i += 1
        }
      }
      val rms = if (count == 0) 0.0 else math.sqrt(sumSq / count)
      Some((sr, ch, frames, frames.toDouble / sr, rms))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally ais.close()
  }

  /** Audio statistics through the SAME `mapPartitions` decode boundary
    * as [[imageStats]] — the REAL decoder in front, stub fallback
    * behind: decodable blobs (JDK WAV/AIFF/AU) report actual sample
    * rate / channels / duration / RMS (`decoded = true`); everything
    * else falls back to zero metadata + the whole-blob byte mean as a
    * stand-in amplitude (`decoded = false`), so one plan serves a
    * mixed corpus of real audio and opaque payloads. */
  def audioStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("sample_rate", DoubleType),
      StructField("channels", IntegerType),
      StructField("frames", LongType),
      StructField("duration_sec", DoubleType),
      StructField("rms", DoubleType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        decodeAudio(bytes) match {
          case Some((sr, ch, frames, dur, rms)) =>
            Row(r.getLong(idIdx), true, sr.toDouble, ch, frames, dur, rms)
          case None =>
            val mean =
              if (bytes == null || bytes.isEmpty) 0.0
              else bytes.map(b => (b & 0xff).toLong).sum.toDouble /
                (bytes.length * 255.0)
            Row(r.getLong(idIdx), false, 0.0, 0, 0L, 0.0, mean)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Decoded, MONO-MIXED, [-1,1]-normalized samples — the raw-material
    * read behind [[audioEnergyHash]]: the same JDK reader set and PCM
    * encodings as [[decodeAudio]] (signed 16 either endianness, signed/
    * unsigned 8), channels averaged per frame. None exactly when
    * [[decodeAudio]] would fall back. */
  def decodeAudioSamples(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null) return None
    pcmWavChunks(bytes) match {
      case Some((rate, ch, bits, data)) =>
        // same mono-mix arithmetic as the JDK branch below, per frame
        val bytesPer = bits / 8
        val frameBytes = bytesPer * ch
        val nFrames = data.length / frameBytes
        if (nFrames <= 0 || rate <= 0) return None
        val out = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val o = f * frameBytes + c * bytesPer
            acc +=
              (if (bits == 16)
                ((data(o + 1) << 8) | (data(o) & 0xff)).toShort / 32768.0
              else ((data(o) & 0xff) - 128) / 128.0)
            c += 1
          }
          out(f) = acc / ch
          f += 1
        }
        return Some(out)
      case None => // not canonical PCM WAV — JDK readers below
    }
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (ais == null) return None
    try {
      val fmt = ais.getFormat
      val ch = fmt.getChannels
      val bits = fmt.getSampleSizeInBits
      val enc = fmt.getEncoding
      if (ais.getFrameLength <= 0 || fmt.getSampleRate <= 0 || ch <= 0)
        return None
      val signed16 = enc == AudioFormat.Encoding.PCM_SIGNED && bits == 16
      val signed8 = enc == AudioFormat.Encoding.PCM_SIGNED && bits == 8
      val unsigned8 = enc == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
      if (!signed16 && !signed8 && !unsigned8) return None
      val data = {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = ais.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = ais.read(chunk) }
        buf.toByteArray
      }
      val bytesPer = if (signed16) 2 else 1
      val frameBytes = bytesPer * ch
      val nFrames = data.length / frameBytes
      val out = new Array[Double](nFrames)
      val big = fmt.isBigEndian
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val o = f * frameBytes + c * bytesPer
          acc +=
            (if (signed16) {
              val s = if (big) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
                      else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
              s / 32768.0
            } else if (signed8) data(o) / 128.0
            else ((data(o) & 0xff) - 128) / 128.0)
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally ais.close()
  }

  /** AUDIO FINGERPRINT — the [[dHash]] difference discipline applied
    * TEMPORALLY (the energy-band comparison family Chromaprint/
    * AcoustID built on, reduced to its deterministic core): the sample
    * stream splits into `windows` equal integer-boundary blocks, per
    * block the mean-square ENERGY, and bit w is set iff block w is
    * strictly louder than block w+1 — a (windows−1)-bit envelope
    * signature. Near-dup audio — re-encoded, amplitude-perturbed,
    * slightly trimmed — keeps most bits (the comparisons survive any
    * monotone gain change), so Hamming distance is the audio-side
    * near-dup key and [[phashPairs]]' 4×16-bit banding applies to it
    * unchanged. Windows default 64 → 63 bits (bit 63 stays clear on
    * both engines — no sign-overflow edge in the SQL twin). Streams
    * shorter than one sample per window have undefined blocks → None
    * (the fallback row). */
  def audioEnergyHash(samples: Array[Double],
                      windows: Int = 64): Option[Long] = {
    if (samples == null || samples.length < windows) return None
    val n = samples.length
    val e = new Array[Double](windows)
    var w = 0
    while (w < windows) {
      val from = w.toLong * n / windows
      val to = (w + 1).toLong * n / windows
      var s = 0.0
      var i = from
      while (i < to) { s += samples(i.toInt) * samples(i.toInt); i += 1 }
      e(w) = s / (to - from)
      w += 1
    }
    var hash = 0L
    w = 0
    while (w < windows - 1) {
      if (e(w) > e(w + 1)) hash |= 1L << w
      w += 1
    }
    Some(hash)
  }

  /** Per-row audio fingerprint through the same `mapPartitions` codec
    * boundary as [[audioStats]]: decodable blobs emit their 63-bit
    * energy hash (`decoded = true`), everything else a zero-hash
    * fallback row — [[phashPairs]] filters those before banding. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("ahash", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeAudioSamples(r.getAs[Array[Byte]](blobIdx))
          .flatMap(audioEnergyHash(_)) match {
          case Some(hv) => Row(r.getLong(idIdx), true, hv)
          case None => Row(r.getLong(idIdx), false, 0L)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** A minimal 16-bit mono PCM WAV (44-byte RIFF header, little-endian
    * samples) — the audio synthesis primitive the closed-form fixtures
    * need: what the JDK reader decodes from this container is exactly
    * `samples`, no transcoding. */
  def minimalWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(o: Int, s: String): Unit =
      s.getBytes("ISO-8859-1").zipWithIndex.foreach { case (b, i) => out(o + i) = b }
    ascii(0, "RIFF"); writeLE32(out, 4, 36L + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); writeLE32(out, 16, 16L)
    out(20) = 1; out(21) = 0            // PCM
    out(22) = 1; out(23) = 0            // mono
    writeLE32(out, 24, sampleRate.toLong)
    writeLE32(out, 28, sampleRate * 2L) // byte rate
    out(32) = 2; out(33) = 0            // block align
    out(34) = 16; out(35) = 0           // bits per sample
    ascii(36, "data"); writeLE32(out, 40, dataLen.toLong)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(44 + 2 * i) = (s & 0xff).toByte
      out(44 + 2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    out
  }

  /** Closed-form audio-hash fixture (the [[synthesizePhashMedia]]
    * pattern on the audio side): id % 5 == 0 rows are opaque payloads;
    * every other id becomes a 64-block 16-bit mono WAV where block w is
    * LOUD (amplitude 16000) iff bit w of the id is set, quiet (2000)
    * otherwise — constant within a block, so block energies are exact
    * squares and [[audioEnergyHash]] bit w has the closed form
    * `bit_w(id) = 1 AND bit_{w+1}(id) = 0`, which the DuckDB twin
    * recomputes arithmetically. 125 samples per block at 8 kHz (1 s of
    * audio), so integer window boundaries land exactly on the
    * amplitude switches. */
  def synthesizeAudioHashMedia(docs: DataFrame, id: String): DataFrame =
    docs.select(col(id).cast(LongType).as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val blob: Array[Byte] =
          if (i % 5 == 0) s"opaque payload $i".getBytes("UTF-8")
          else {
            val perBlock = 125
            val samples = new Array[Short](64 * perBlock)
            var w = 0
            while (w < 64) {
              val amp: Short =
                if (((i >> w) & 1L) == 1L) 16000 else 2000
              java.util.Arrays.fill(samples, w * perBlock,
                (w + 1) * perBlock, amp)
              w += 1
            }
            minimalWav(samples, 8000)
          }
        Row(i, "audio", blob, Row(0, 0, "stub"))
      }
    }(RowEncoder.encoderFor(mediaSchema))

  // ---- video container metadata: dependency-free box/header parse ----

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)

  /** The (type, contentStart, end) triples of the ISO-BMFF boxes packed
    * in `b[from, to)` — one level; callers recurse into container boxes
    * (`moov`, `trak`). Tolerates 64-bit largesize and a final
    * size-0-to-end box; stops at the first malformed header. */
  private def mp4Boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = from
    var ok = true
    while (ok && o + 8 <= to) {
      var size = be32(b, o)
      val typ = new String(b, o + 4, 4, "ISO-8859-1")
      var hdr = 8
      if (size == 1 && o + 16 <= to) { size = be64(b, o + 8); hdr = 16 }
      else if (size == 0) size = (to - o).toLong
      if (size < hdr || size > to - o) ok = false
      else { out += ((typ, o + hdr, o + size.toInt)); o += size.toInt }
    }
    out.result()
  }

  private def parseMp4(b: Array[Byte]): Option[(Double, Int, Int, Int)] = {
    val top = mp4Boxes(b, 0, b.length)
    if (!top.exists(_._1 == "ftyp")) return None
    top.find(_._1 == "moov").flatMap { case (_, s, e) =>
      val inner = mp4Boxes(b, s, e)
      // mvhd: fullbox — version 0 packs timescale/duration as u32 at
      // content offsets 12/16, version 1 as u32/u64 at 20/24
      val dur = inner.find(_._1 == "mvhd").flatMap { case (_, ms, me) =>
        (b(ms) & 0xff) match {
          case 1 if me - ms >= 32 =>
            val ts = be32(b, ms + 20)
            if (ts > 0) Some(be64(b, ms + 24).toDouble / ts) else None
          case 0 if me - ms >= 20 =>
            val ts = be32(b, ms + 12)
            if (ts > 0) Some(be32(b, ms + 16).toDouble / ts) else None
          case _ => None
        }
      }
      val traks = inner.filter(_._1 == "trak")
      // tkhd: width/height as 16.16 fixed-point at content offset 76
      // (v0) / 88 (v1); the first track with non-zero dims is the video
      // track (audio tracks carry zeros)
      val dims = traks.iterator.flatMap { case (_, ts, te) =>
        mp4Boxes(b, ts, te).find(_._1 == "tkhd").flatMap { case (_, hs, he) =>
          val wOff = if ((b(hs) & 0xff) == 1) hs + 88 else hs + 76
          if (wOff + 8 <= he) {
            val w = (be32(b, wOff) >> 16).toInt
            val h = (be32(b, wOff + 4) >> 16).toInt
            if (w > 0 && h > 0) Some((w, h)) else None
          } else None
        }
      }.nextOption()
      dur.map(d => (d, dims.map(_._1).getOrElse(0),
        dims.map(_._2).getOrElse(0), traks.length))
    }
  }

  private def parseAvi(b: Array[Byte]): Option[(Double, Int, Int, Int)] = {
    // the required `avih` main header sits early in the `hdrl` LIST; a
    // bounded linear scan for its fourcc keeps the parse tolerant of
    // odd chunk padding. Fields are little-endian u32s.
    val limit = math.min(b.length - 48, 4096)
    var idx = -1
    var o = 12
    while (idx < 0 && o < limit) {
      if (b(o) == 'a' && b(o + 1) == 'v' && b(o + 2) == 'i' && b(o + 3) == 'h')
        idx = o
      o += 1
    }
    if (idx < 0) return None
    val hs = idx + 8 // past fourcc + chunk size
    val usPerFrame = le32(b, hs)
    val frames = le32(b, hs + 16)
    val streams = le32(b, hs + 24)
    val w = le32(b, hs + 32).toInt
    val h = le32(b, hs + 36).toInt
    Some((if (usPerFrame > 0) frames * usPerFrame / 1e6 else 0.0,
      w, h, streams.toInt))
  }

  /** REAL video container-metadata decode — no codec required: an MP4
    * (ISO-BMFF) `moov` walk (`mvhd` timescale/duration, `tkhd` track
    * dims, `trak` count) or an AVI `avih` main-header parse. Returns
    * (duration seconds, width, height, track/stream count); None for
    * bytes that are neither container — callers fall back to the stub
    * path, mirroring [[decodeImage]]/[[decodeAudio]]. Pixel-level frame
    * decode stays behind the [[sampleFrames]] stub (no codec in the
    * JDK); this retires the metadata half of the video stub. */
  def decodeVideoMeta(bytes: Array[Byte]): Option[(Double, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      val isMp4 = bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p'
      val isAvi = bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' &&
        bytes(10) == 'I' && bytes(11) == ' '
      if (isMp4) parseMp4(bytes)
      else if (isAvi) parseAvi(bytes)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- deterministic container synthesis (fixture generators) ----------

  private def be32b(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32b(v: Long): Array[Byte] = Array((v & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def isoBox(typ: String, content: Array[Byte]): Array[Byte] =
    be32b(content.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ content

  /** A minimal REAL MP4 (ISO-BMFF) container: `ftyp` + `moov`(`mvhd`
    * timescale 1000 / duration `durMs`, `tracks` traks — the first
    * carries the 16.16 fixed-point dims, the rest zero-dim audio-style).
    * Deterministic bytes; [[decodeVideoMeta]] inverts it to
    * (durMs/1000.0, w, h, tracks). */
  def minimalMp4(durMs: Long, w: Int, h: Int, tracks: Int): Array[Byte] = {
    require(tracks >= 1, s"tracks must be >= 1, got $tracks")
    val mvhd = isoBox("mvhd",
      be32b(0) ++ be32b(0) ++ be32b(0) ++ be32b(1000) ++ be32b(durMs))
    val traks = (0 until tracks).map { i =>
      val c = new Array[Byte](84) // tkhd v0: 16.16 dims at 76/80
      if (i == 0) {
        System.arraycopy(be32b(w.toLong << 16), 0, c, 76, 4)
        System.arraycopy(be32b(h.toLong << 16), 0, c, 80, 4)
      }
      isoBox("trak", isoBox("tkhd", c))
    }.reduce(_ ++ _)
    isoBox("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      isoBox("moov", mvhd ++ traks)
  }

  /** A minimal REAL AVI: RIFF/`AVI ` + `hdrl` LIST holding the required
    * `avih` main header (all LE u32s). [[decodeVideoMeta]] inverts it to
    * (frames*usPerFrame/1e6, w, h, streams). */
  def minimalAvi(usPerFrame: Long, frames: Long, w: Int, h: Int,
                 streams: Int): Array[Byte] = {
    val avih = new Array[Byte](56)
    System.arraycopy(le32b(usPerFrame), 0, avih, 0, 4)
    System.arraycopy(le32b(frames), 0, avih, 16, 4)
    System.arraycopy(le32b(streams), 0, avih, 24, 4)
    System.arraycopy(le32b(w), 0, avih, 32, 4)
    System.arraycopy(le32b(h), 0, avih, 36, 4)
    val hdrl = "hdrl".getBytes("ISO-8859-1") ++
      "avih".getBytes("ISO-8859-1") ++ le32b(56) ++ avih
    val body = "AVI ".getBytes("ISO-8859-1") ++
      "LIST".getBytes("ISO-8859-1") ++ le32b(hdrl.length) ++ hdrl
    "RIFF".getBytes("ISO-8859-1") ++ le32b(body.length) ++ body
  }

  /** Synthesize a VIDEO media table whose blobs are REAL containers
    * built at id-derived closed forms (shared verbatim with the
    * `q_multimodal_video` DuckDB oracle, which recomputes the expected
    * metadata arithmetically — the check is that the container parse
    * INVERTS this synthesis): id % 7 == 0 → opaque payload (stub
    * fallback exercises the mixed-corpus path), else even id → MP4
    * (duration id*137 % 30000 + 1000 ms, tracks id/2 % 2 + 1), odd id →
    * AVI (25 fps × (id % 750 + 25) frames, id % 3 + 1 streams); both
    * real shapes at dims (id*37 % 1904 + 16, id*17 % 1064 + 16). Runs
    * in the same mapPartitions codec boundary as the decode side. */
  def synthesizeVideoMedia(docs: DataFrame, id: String): DataFrame =
    docs.select(col(id).cast(LongType).as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val blob: Array[Byte] =
          if (i % 7 == 0) s"opaque payload $i".getBytes("UTF-8")
          else if (i % 2 == 0)
            minimalMp4(i * 137 % 30000 + 1000,
              (i * 37 % 1904 + 16).toInt, (i * 17 % 1064 + 16).toInt,
              (i / 2 % 2 + 1).toInt)
          else
            minimalAvi(40000L, i % 750 + 25,
              (i * 37 % 1904 + 16).toInt, (i * 17 % 1064 + 16).toInt,
              (i % 3 + 1).toInt)
        Row(i, "video", blob,
          Row((i * 37 % 1920 + 1).toInt, (i * 17 % 1080 + 1).toInt, "stub"))
      }
    }(RowEncoder.encoderFor(mediaSchema))

  /** Video statistics through the SAME `mapPartitions` decode boundary
    * as [[imageStats]]/[[audioStats]] — the REAL container parser in
    * front, stub fallback behind: parseable blobs (MP4/AVI) report
    * actual duration / dimensions / track count (`decoded = true`);
    * everything else falls back to the synthesized metadata dims + zero
    * duration (`decoded = false`), so one plan serves a mixed corpus of
    * real containers and opaque payloads. */
  def videoStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("decoded", BooleanType),
      StructField("duration_sec", DoubleType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("tracks", IntegerType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        decodeVideoMeta(bytes) match {
          case Some((dur, w, h, tracks)) =>
            Row(r.getLong(idIdx), true, dur, w, h, tracks)
          case None =>
            val meta = r.getStruct(metaIdx)
            Row(r.getLong(idIdx), false, 0.0,
              meta.getInt(0), meta.getInt(1), 0)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---- pixel-level frame decode: real for uncompressed payloads -------

  private def writeLE32(out: Array[Byte], o: Int, v: Long): Unit = {
    out(o) = (v & 0xff).toByte
    out(o + 1) = ((v >> 8) & 0xff).toByte
    out(o + 2) = ((v >> 16) & 0xff).toByte
    out(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** A minimal REAL 24-bit uncompressed BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes) — the
    * JDK's own `javax.imageio` BMP reader decodes it exactly (BI_RGB,
    * no color management), so generated frames round-trip pixel-exact
    * through [[decodeImage]]. `pix(x, y)` returns packed 0xRRGGBB. */
  def minimalBmp(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bmp dims must be positive: ${w}x$h")
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    writeLE32(out, 2, 54L + dataSize)
    writeLE32(out, 10, 54)
    writeLE32(out, 14, 40)
    writeLE32(out, 18, w)
    writeLE32(out, 22, h)
    out(26) = 1  // planes (LE16)
    out(28) = 24 // bits per pixel (LE16)
    writeLE32(out, 34, dataSize)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = pix(x, y)
        val o = 54 + (h - 1 - y) * rowSize + x * 3
        out(o) = (rgb & 0xff).toByte
        out(o + 1) = ((rgb >> 8) & 0xff).toByte
        out(o + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[minimalAvi]] extended with a `movi` LIST of `00db` (uncompressed
    * DIB) frame chunks — the standard place an AVI keeps its frame
    * payloads. [[extractAviFrames]] inverts it. */
  def minimalAviFrames(usPerFrame: Long, w: Int, h: Int, streams: Int,
                       frames: Seq[Array[Byte]],
                       fourcc: String = "00db"): Array[Byte] = {
    val avih = new Array[Byte](56)
    System.arraycopy(le32b(usPerFrame), 0, avih, 0, 4)
    System.arraycopy(le32b(frames.length), 0, avih, 16, 4)
    System.arraycopy(le32b(streams), 0, avih, 24, 4)
    System.arraycopy(le32b(w), 0, avih, 32, 4)
    System.arraycopy(le32b(h), 0, avih, 36, 4)
    val hdrl = "hdrl".getBytes("ISO-8859-1") ++
      "avih".getBytes("ISO-8859-1") ++ le32b(56) ++ avih
    val movi = "movi".getBytes("ISO-8859-1") ++ frames.flatMap { f =>
      fourcc.getBytes("ISO-8859-1") ++ le32b(f.length) ++ f ++
        (if (f.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    }
    val body = "AVI ".getBytes("ISO-8859-1") ++
      "LIST".getBytes("ISO-8859-1") ++ le32b(hdrl.length) ++ hdrl ++
      "LIST".getBytes("ISO-8859-1") ++ le32b(movi.length) ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32b(body.length) ++ body
  }

  /** A REAL baseline JPEG of a solid GRAY frame, encoded by the JDK's
    * own `javax.imageio` JPEG writer at quality 1.0 — the MJPEG frame
    * payload generator. Gray specifically: for r = g = b = c the
    * JFIF YCbCr transform gives Y = c exactly and Cb = Cr = 128, a
    * constant block's DCT carries only the DC coefficient, and the
    * quality-1.0 quantization tables leave it intact — so the decode
    * round-trips PIXEL-EXACT (channel means are exactly c/255, the
    * closed form the `q_multimodal_mjpeg` oracle recomputes in SQL).
    * Chroma subsampling averages constant planes losslessly, so the
    * exactness holds at any frame size. */
  def minimalJpegGray(w: Int, h: Int, c: Int): Array[Byte] = {
    require(w > 0 && h > 0 && c >= 0 && c <= 255,
      s"jpeg frame out of range: ${w}x$h gray $c")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (c << 16) | (c << 8) | c
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { wr.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Standard AVIs carry `00db` chunks as HEADERLESS DIB data — a
    * BITMAPINFOHEADER (or a raster preceded by one) with no 14-byte
    * BITMAPFILEHEADER — which `ImageIO`'s BMP reader rejects. Detect
    * the bare header (leading LE32 biSize = 40) and prepend a
    * synthesized file header so real-world uncompressed frames decode
    * instead of uniformly reporting `decoded = false`; the data offset
    * accounts for a palette when biBitCount ≤ 8 (biClrUsed entries, or
    * the full 2^bpp table when biClrUsed = 0). Frames that already
    * start with 'BM' (complete BMP files, as [[minimalBmp]] emits) and
    * non-DIB payloads (JPEG frames of an MJPEG stream) pass through
    * untouched. */
  def wrapDibFrame(f: Array[Byte]): Array[Byte] = {
    if (f == null || f.length < 40) return f
    if (f(0) == 'B' && f(1) == 'M') return f
    if (le32(f, 0) != 40L) return f
    val bpp = ((f(14) & 0xff) | ((f(15) & 0xff) << 8))
    val clrUsed = le32(f, 32)
    val palette =
      if (bpp > 8) 0L
      else if (clrUsed > 0) clrUsed * 4L
      else (1L << bpp) * 4L
    val out = new Array[Byte](14 + f.length)
    out(0) = 'B'; out(1) = 'M'
    writeLE32(out, 2, 14L + f.length)
    writeLE32(out, 10, 14L + 40L + palette)
    System.arraycopy(f, 0, out, 14, f.length)
    out
  }

  /** REAL frame extraction from an AVI container — the RIFF chunk walk
    * (recursing into LISTs) collecting `..db`/`..dc` stream-data
    * payloads in order. None for non-AVI bytes or an AVI with no frame
    * chunks — callers fall back to the stub path, the
    * [[decodeVideoMeta]] discipline one level deeper. */
  def extractAviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'A' && bytes(9) == 'V' &&
        bytes(10) == 'I' && bytes(11) == ' ')) return None
    val frames = Seq.newBuilder[Array[Byte]]
    // ITERATIVE walk (explicit worklist, not recursion): a corrupt or
    // adversarial blob of deeply nested LIST headers would otherwise
    // StackOverflow — a VirtualMachineError that NonFatal does NOT
    // catch, so one bad row would kill the task instead of falling
    // back to the stub path (the mixed-corpus contract)
    // DFS pre-order preserved: on a LIST, push the continuation AFTER
    // it, then the nested range, and yield — pop order descends first,
    // exactly the recursive traversal's frame order
    val work = scala.collection.mutable.Stack((12, bytes.length))
    try while (work.nonEmpty) {
      var (o, to) = work.pop()
      var ok = true
      while (ok && o + 8 <= to) {
        val four = new String(bytes, o, 4, "ISO-8859-1")
        val size = le32(bytes, o + 4).toInt
        if (size < 0 || o + 8 + size > to) ok = false
        else if (four == "LIST" && size >= 4) {
          work.push((o + 8 + size + (size & 1), to))
          work.push((o + 12, o + 8 + size))
          ok = false
        } else {
          if (four.endsWith("db") || four.endsWith("dc"))
            frames += java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + size)
          o += 8 + size + (size & 1)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => return None }
    val fs = frames.result()
    if (fs.isEmpty) None else Some(fs)
  }

  /** PIXEL-level frame statistics — the operator that retires the
    * rasterization stub for every codec the JDK ships a reader for:
    * per video row, frames come out of the REAL container walk
    * ([[extractAviFrames]]) and each frame rasterizes through the REAL
    * [[decodeImage]] — complete BMP files and headerless DIBs (via
    * [[wrapDibFrame]]) through the BMP reader, MJPEG `..dc` frames
    * (standalone JPEGs, the dominant compressed intra-frame AVI codec)
    * through the JPEG reader. One row per (media, frame): (media_id,
    * frame_idx, decoded, width, height, mean_r, mean_g, mean_b).
    * Frames of a codec the JDK lacks (inter-frame codecs: MPEG-4,
    * H.264…) report `decoded = false` with zeroed stats, and a blob
    * that is not a frame-bearing AVI emits ONE fallback row — the
    * mixed-corpus discipline of [[imageStats]]/[[videoStats]], so one
    * plan serves real containers, compressed codecs, and opaque bytes.
    * Same `mapPartitions` codec boundary; binary payloads never
    * shuffle, only the fixed-width stats rows do. */
  def frameStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_r", DoubleType),
      StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        extractAviFrames(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(frames) => frames.iterator.zipWithIndex.map {
            case (f, k) => decodeImage(wrapDibFrame(f)) match {
              case Some((w, h, _, means)) =>
                Row(id, k, true, w, h, means(0), means(1), means(2))
              case None => Row(id, k, false, 0, 0, 0.0, 0.0, 0.0)
            }
          }
          case None => Iterator.single(Row(id, 0, false, 0, 0, 0.0, 0.0, 0.0))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Synthesize a FRAME-BEARING video table at id-derived closed forms
    * (shared verbatim with the `q_multimodal_pixels` DuckDB oracle,
    * which recomputes the expected stats arithmetically — the check is
    * that container walk + BMP rasterization INVERT this synthesis):
    * id % 5 == 0 → opaque payload (stub fallback); else an AVI holding
    * `id % 3 + 1` solid-color BMP frames at dims (id*13 % 24 + 4,
    * id*7 % 16 + 4), frame k colored (id*31+k*17, id*11+k*7, id*5+k*3)
    * each mod 256. A solid frame's channel mean is EXACTLY c/255 (IEEE
    * division of the same rational), so the oracle is hash-exact. */
  def synthesizeFrameMedia(docs: DataFrame, id: String): DataFrame =
    docs.select(col(id).cast(LongType).as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val blob: Array[Byte] =
          if (i % 5 == 0) s"opaque payload $i".getBytes("UTF-8")
          else {
            val w = (i * 13 % 24 + 4).toInt
            val h = (i * 7 % 16 + 4).toInt
            val frames = (0 to (i % 3).toInt).map { k =>
              val rr = ((i * 31 + k * 17) % 256).toInt
              val gg = ((i * 11 + k * 7) % 256).toInt
              val bb = ((i * 5 + k * 3) % 256).toInt
              minimalBmp(w, h)((_, _) => (rr << 16) | (gg << 8) | bb)
            }
            minimalAviFrames(40000L, w, h, 1, frames)
          }
        Row(i, "video", blob,
          Row((i * 37 % 1920 + 1).toInt, (i * 17 % 1080 + 1).toInt, "stub"))
      }
    }(RowEncoder.encoderFor(mediaSchema))

  /** The COMPRESSED-codec twin of [[synthesizeFrameMedia]]: MJPEG AVIs
    * — `00dc` chunks holding standalone JPEGs ([[minimalJpegGray]]) —
    * at the same id-derived closed forms, restricted to GRAY frames
    * (c = (id·31 + k·17) mod 256 on all three channels) because gray
    * solids are the subset the JPEG codec round-trips pixel-exact
    * (see [[minimalJpegGray]]); the `q_multimodal_mjpeg` DuckDB oracle
    * recomputes the expected stats arithmetically, so row equality
    * proves the container walk + JDK JPEG rasterization INVERT a
    * COMPRESSED encoding. id % 5 == 0 rows stay opaque payloads
    * (fallback path in the same plan). */
  def synthesizeMjpegMedia(docs: DataFrame, id: String): DataFrame =
    docs.select(col(id).cast(LongType).as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val blob: Array[Byte] =
          if (i % 5 == 0) s"opaque payload $i".getBytes("UTF-8")
          else {
            val w = (i * 13 % 24 + 4).toInt
            val h = (i * 7 % 16 + 4).toInt
            val frames = (0 to (i % 3).toInt).map { k =>
              minimalJpegGray(w, h, ((i * 31 + k * 17) % 256).toInt)
            }
            minimalAviFrames(40000L, w, h, 1, frames, fourcc = "00dc")
          }
        Row(i, "video", blob,
          Row((i * 37 % 1920 + 1).toInt, (i * 17 % 1080 + 1).toInt, "MJPG"))
      }
    }(RowEncoder.encoderFor(mediaSchema))

  /** Fixture generator for `q_multimodal_phash`: one REAL 18×16 BMP per
    * id whose 8 cell-row gradients each run left→right (brighter) or
    * right→left, the direction of cell-row dy (0..6) taken from BIT dy
    * of the id (row 7 always decreasing, keeping the hash below 2⁵⁶ so
    * the oracle's BIGINT arithmetic never wraps). [[dHash]]'s grid is
    * exactly 2×2 pixels per cell here, gradients are strictly monotone
    * across cells, so the hash has the CLOSED FORM
    * `Σ_{dy≤6, bit dy of id clear} 0xFF << 8·dy` — the DuckDB twin
    * recomputes it arithmetically, and row equality proves decode +
    * downsample + comparison invert the pixel encoding. id % 5 == 0
    * rows stay opaque payloads (the fallback path in the same plan). */
  def synthesizePhashMedia(docs: DataFrame, id: String): DataFrame =
    docs.select(col(id).cast(LongType).as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val blob: Array[Byte] =
          if (i % 5 == 0) s"opaque payload $i".getBytes("UTF-8")
          else minimalBmp(18, 16) { (x, y) =>
            val dy = y / 2
            val up = dy < 7 && ((i >> dy) & 1) == 0
            val v = if (up) x * 14 else (17 - x) * 14
            (v << 16) | (v << 8) | v
          }
        Row(i, "image", blob, Row(18, 16, "stub"))
      }
    }(RowEncoder.encoderFor(mediaSchema))

  /** Per-sampled-frame perceptual hashing — [[imagePhash]] pushed
    * through the video container boundary: each `..db`/`..dc` frame of
    * a frame-bearing AVI rasterizes ([[wrapDibFrame]] → the real BMP/
    * JPEG readers) and hashes ([[dHash]]), one row per (media, frame).
    * The per-frame hash SEQUENCE is the video near-dup key: re-encoded
    * or trimmed copies keep most per-frame bits, so the existing
    * banding + `bit_count` verify ([[phashPairs]] over a composite
    * (media, frame) id, or frame-majority voting above it) applies
    * unchanged. Undecodable frames emit `decoded = false` zero-hash
    * rows; a blob that is not a frame-bearing AVI emits ONE fallback
    * row — the [[frameStats]] mixed-corpus discipline. */
  def videoPhash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("decoded", BooleanType),
      StructField("phash", LongType)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        extractAviFrames(r.getAs[Array[Byte]](blobIdx)) match {
          case Some(frames) => frames.iterator.zipWithIndex.map {
            case (f, k) => dHash(wrapDibFrame(f)) match {
              case Some(hv) => Row(id, k, true, hv)
              case None => Row(id, k, false, 0L)
            }
          }
          case None => Iterator.single(Row(id, 0, false, 0L))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Closed-form video-hash fixture — [[synthesizePhashMedia]]'s
    * gradient BMP, one per frame, with the per-cell-row direction bit
    * taken from (id + frame_idx): container walk + rasterization +
    * [[dHash]] must invert to
    * `Σ_{dy≤6, bit dy of (id+k) clear} 0xFF << 8·dy` per frame, which
    * the DuckDB twin recomputes arithmetically. `id % 3 + 1` frames
    * per video (the [[synthesizeFrameMedia]] fan-out), id % 5 == 0
    * rows opaque. */
  def synthesizeVhashMedia(docs: DataFrame, id: String): DataFrame =
    docs.select(col(id).cast(LongType).as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val i = r.getLong(0)
        val blob: Array[Byte] =
          if (i % 5 == 0) s"opaque payload $i".getBytes("UTF-8")
          else {
            val frames = (0 to (i % 3).toInt).map { k =>
              minimalBmp(18, 16) { (x, y) =>
                val dy = y / 2
                val up = dy < 7 && (((i + k) >> dy) & 1) == 0
                val v = if (up) x * 14 else (17 - x) * 14
                (v << 16) | (v << 8) | v
              }
            }
            minimalAviFrames(40000L, 18, 16, 1, frames)
          }
        Row(i, "video", blob, Row(18, 16, "stub"))
      }
    }(RowEncoder.encoderFor(mediaSchema))

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
