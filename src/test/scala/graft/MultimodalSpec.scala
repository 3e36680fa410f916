package graft

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

/** Binary-column plumbing: schema, batch shape, and the decode boundary
  * — REAL for images (javax.imageio, JDK-built-in readers, verified on
  * generated PNG/JPEG fixtures below), deterministic stub for the
  * codec-less media types.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** PNG bytes for a w×h image filled by (x, y) → packed RGB. */
  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: real PNG decode — exact dims and channel means") {
    // 4x2: left half pure red, right half pure blue -> mean_r = mean_b
    // = 0.5 EXACTLY (4 of 8 pixels at 255), mean_g = 0
    val bytes = png(4, 2)((x, _) => if (x < 2) 0xff0000 else 0x0000ff)
    val Some((w, h, ch, means)) = Multimodal.decodeImage(bytes)
    assert(w == 4 && h == 2 && ch == 3)
    assert(means(0) == 0.5 && means(1) == 0.0 && means(2) == 0.5)
    // JPEG round-trips through the same reader (lossy — dims only)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val Some((jw, jh, _, _)) = Multimodal.decodeImage(bos.toByteArray)
    assert(jw == 4 && jh == 2)
    // non-image bytes refuse instead of garbage
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    // a TRUNCATED container (valid magic, cut body) must also refuse —
    // JDK readers throw runtime exceptions on malformed media, and the
    // mixed-corpus contract demands the fallback, not a dead task
    assert(Multimodal.decodeImage(bytes.take(24)).isEmpty)
  }

  test("imageStats: real decode and stub fallback share one plan") {
    import spark.implicits._
    val checker = png(2, 2)((x, y) =>
      if ((x + y) % 2 == 0) 0xffffff else 0x000000) // 2 white, 2 black
    val rows = Seq(
      (1L, "image", checker, (7, 9, "png")),
      (2L, "image", "opaque payload".getBytes.toSeq.toArray, (640, 480, "stub")))
      .toDF("media_id", "media_type", "blob", "m")
      .select(col("media_id"), col("media_type"), col("blob"),
        struct(col("m._1").as("width"), col("m._2").as("height"),
          col("m._3").as("codec")).as("meta"))
    val out = Multimodal.imageStats(rows).orderBy("media_id").collect()
    val real = out(0)
    assert(real.getBoolean(1) && real.getInt(2) == 2 && real.getInt(3) == 2)
    assert(real.getInt(4) == 3 && real.getDouble(5) == 0.5 &&
      real.getDouble(6) == 0.5 && real.getDouble(7) == 0.5)
    val stub = out(1)
    assert(!stub.getBoolean(1), "opaque bytes must take the fallback path")
    assert(stub.getInt(2) == 640 && stub.getInt(3) == 480 && stub.getInt(4) == 0)
    assert(stub.getDouble(5) > 0 && stub.getDouble(5) == stub.getDouble(6))
    // the synthesized corpus flows through the same operator end-to-end
    // (UTF-8 payloads all take the fallback), proving mixed-plan safety
    val corpus = Multimodal.imageStats(Multimodal.synthesizeMedia(
      Tables.documents(spark, sf0001), "doc_id", "text"))
    assert(corpus.where(col("decoded")).count() == 0)
    assert(corpus.count() == Tables.documents(spark, sf0001).count())
  }

  test("decodeAudio: real WAV decode — rate, channels, duration, RMS") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // a 0.5 s 440 Hz sine at amplitude 0.5, 16-bit mono PCM 8 kHz,
    // written through the JDK's own WAV writer
    val sr = 8000f
    val n = 4000
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (amp * math.sin(2 * math.Pi * 440 * i / sr) * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte        // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val Some((rate, ch, frames, dur, rms)) = Multimodal.decodeAudio(wav)
    assert(rate == 8000f && ch == 1 && frames == 4000L)
    assert(math.abs(dur - 0.5) < 1e-9)
    // a sine's RMS is amp/sqrt(2)
    assert(math.abs(rms - amp / math.sqrt(2)) < 0.01, s"rms=$rms")
    // opaque payloads don't decode
    assert(Multimodal.decodeAudio("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(null).isEmpty)

    // audioStats: one plan serves real WAVs and opaque payloads
    import spark.implicits._
    val media = Seq(
      (1L, "audio", wav),
      (2L, "audio", "opaque bytes".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "blob")
    val stats = Multimodal.audioStats(media).orderBy("media_id").collect()
    assert(stats(0).getBoolean(1) && stats(0).getDouble(2) == 8000.0 &&
      stats(0).getLong(4) == 4000L)
    assert(!stats(1).getBoolean(1) && stats(1).getDouble(2) == 0.0 &&
      stats(1).getDouble(6) > 0.0) // byte-mean fallback amplitude
  }

  test("decodeVideoMeta: MP4 box walk + AVI header parse; stub fallback") {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, content: Array[Byte]): Array[Byte] =
      be32(content.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ content
    // a minimal generated MP4: ftyp + moov(mvhd timescale=1000
    // duration=5000, video trak 320x240, zero-dim audio trak)
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(5000))
    val tkhdContent = new Array[Byte](84) // v0: 16.16 dims at 76/80
    System.arraycopy(be32(320L << 16), 0, tkhdContent, 76, 4)
    System.arraycopy(be32(240L << 16), 0, tkhdContent, 80, 4)
    val traks = box("trak", box("tkhd", tkhdContent)) ++
      box("trak", box("tkhd", new Array[Byte](84)))
    val mp4 = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      box("moov", mvhd ++ traks)
    assert(Multimodal.decodeVideoMeta(mp4).contains((5.0, 320, 240, 2)))

    // a minimal AVI: RIFF/AVI + LIST hdrl + avih (LE): 25 fps × 250
    // frames, 640x480, 2 streams
    def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val avih = new Array[Byte](56)
    System.arraycopy(le32(40000), 0, avih, 0, 4)  // dwMicroSecPerFrame
    System.arraycopy(le32(250), 0, avih, 16, 4)   // dwTotalFrames
    System.arraycopy(le32(2), 0, avih, 24, 4)     // dwStreams
    System.arraycopy(le32(640), 0, avih, 32, 4)
    System.arraycopy(le32(480), 0, avih, 36, 4)
    val hdrl = "hdrl".getBytes ++ "avih".getBytes ++ le32(56) ++ avih
    val body = "AVI ".getBytes ++ "LIST".getBytes ++ le32(hdrl.length) ++ hdrl
    val avi = "RIFF".getBytes ++ le32(body.length) ++ body
    val Some((dur, w, h, streams)) = Multimodal.decodeVideoMeta(avi)
    assert(math.abs(dur - 10.0) < 1e-9 && w == 640 && h == 480 && streams == 2)

    // neither container: no decode
    assert(Multimodal.decodeVideoMeta("plain text payload xx".getBytes).isEmpty)
    assert(Multimodal.decodeVideoMeta(null).isEmpty)

    // videoStats: one plan serves real containers and opaque payloads
    import spark.implicits._
    val media = Seq((1L, "video", mp4), (2L, "video", "opaque".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "blob")
      .withColumn("meta", struct(lit(111).as("width"), lit(222).as("height"),
        lit("stub").as("codec")))
    val stats = Multimodal.videoStats(media).orderBy("media_id").collect()
    assert(stats(0).getBoolean(1) && stats(0).getDouble(2) == 5.0 &&
      stats(0).getInt(3) == 320 && stats(0).getInt(4) == 240 &&
      stats(0).getInt(5) == 2)
    assert(!stats(1).getBoolean(1) && stats(1).getDouble(2) == 0.0 &&
      stats(1).getInt(3) == 111 && stats(1).getInt(4) == 222)
  }

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

  test("frameStats: AVI frame walk + real BMP rasterization; fallbacks share the plan") {
    // direct round-trip: a non-solid (checkerboard) BMP decodes to
    // exact pixels — 4 of 8 white => channel means exactly 0.5
    val cb = Multimodal.minimalBmp(4, 2)((x, y) =>
      if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val Some((w0, h0, _, m0)) = Multimodal.decodeImage(cb)
    assert(w0 == 4 && h0 == 2 && m0(0) == 0.5 && m0(1) == 0.5 && m0(2) == 0.5)
    // container walk inverts the movi packing, order preserved
    val f0 = Multimodal.minimalBmp(9, 5)((_, _) => 0xFF8040)
    val avi = Multimodal.minimalAviFrames(40000, 9, 5, 1, Seq(f0, cb))
    val Some(frames) = Multimodal.extractAviFrames(avi)
    assert(frames.length == 2 && frames(0).sameElements(f0) &&
      frames(1).sameElements(cb))
    // the container's metadata half still parses (avih intact)
    assert(Multimodal.decodeVideoMeta(avi).exists(_._2 == 9))

    // the operator over the closed-form corpus: real frames decode to
    // the synthesis colors; opaque ids (i % 5 == 0) emit one fallback
    // row; an undecodable frame INSIDE a valid container keeps its row
    val ids = (0 until 12).map(_.toLong).toDF("doc_id")
    val out = Multimodal.frameStats(Multimodal.synthesizeFrameMedia(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    for (i <- 0L until 12L) {
      if (i % 5 == 0) {
        val r = out((i, 0))
        assert(!r.getBoolean(2) && r.getInt(3) == 0 && r.getDouble(5) == 0.0)
        assert(!out.contains((i, 1)))
      } else {
        val nf = (i % 3).toInt
        for (k <- 0 to nf) {
          val r = out((i, k))
          assert(r.getBoolean(2), s"id $i frame $k must decode")
          assert(r.getInt(3) == (i * 13 % 24 + 4).toInt &&
            r.getInt(4) == (i * 7 % 16 + 4).toInt, s"id $i frame $k dims")
          assert(r.getDouble(5) == ((i * 31 + k * 17) % 256) / 255.0 &&
            r.getDouble(6) == ((i * 11 + k * 7) % 256) / 255.0 &&
            r.getDouble(7) == ((i * 5 + k * 3) % 256) / 255.0,
            s"id $i frame $k means")
        }
        assert(!out.contains((i, nf + 1)))
      }
    }
    // compressed/unknown codec payload: the walk finds the chunk, the
    // rasterizer declines, the row survives as decoded=false
    assert(Multimodal.extractAviFrames(
      Multimodal.minimalAviFrames(40000, 4, 2, 1, Seq("notabmp".getBytes)))
      .exists(_.length == 1))
    assert(Multimodal.decodeImage("notabmp".getBytes("UTF-8")).isEmpty)
  }

  test("MJPEG frames rasterize pixel-exact; headerless DIBs decode via the wrap") {
    // the COMPRESSED-codec decode: a gray solid JPEG at quality 1.0
    // round-trips exactly (constant-block DCT = DC only, unit
    // quantization) — the property the q_multimodal_mjpeg oracle's
    // closed form depends on
    for (c <- Seq(0, 7, 128, 255)) {
      val j = Multimodal.minimalJpegGray(13, 9, c)
      // a real JPEG signature, not a BMP
      assert((j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8)
      val Some((w, h, _, m)) = Multimodal.decodeImage(j)
      assert(w == 13 && h == 9)
      assert(m(0) == c / 255.0 && m(1) == c / 255.0 && m(2) == c / 255.0,
        s"gray $c decoded to (${m(0)},${m(1)},${m(2)})")
    }
    // the operator over the closed-form MJPEG corpus — identical
    // structure to the BMP test, now through a compressed codec
    val ids = (0 until 12).map(_.toLong).toDF("doc_id")
    val out = Multimodal.frameStats(Multimodal.synthesizeMjpegMedia(ids, "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    for (i <- 0L until 12L if i % 5 != 0; k <- 0 to (i % 3).toInt) {
      val r = out((i, k))
      val c = ((i * 31 + k * 17) % 256) / 255.0
      assert(r.getBoolean(2), s"id $i frame $k must decode")
      assert(r.getInt(3) == (i * 13 % 24 + 4).toInt &&
        r.getInt(4) == (i * 7 % 16 + 4).toInt, s"id $i frame $k dims")
      assert(r.getDouble(5) == c && r.getDouble(6) == c && r.getDouble(7) == c,
        s"id $i frame $k means")
    }

    // headerless DIB (how standard AVIs actually pack 00db chunks:
    // BITMAPINFOHEADER + raster, no BITMAPFILEHEADER): the wrap
    // synthesizes the file header and the JDK BMP reader decodes the
    // exact pixels; complete BMPs and JPEGs pass through untouched
    val bmp = Multimodal.minimalBmp(6, 4)((x, _) =>
      if (x < 3) 0xFF0000 else 0x0000FF)
    val dib = java.util.Arrays.copyOfRange(bmp, 14, bmp.length)
    assert(Multimodal.decodeImage(dib).isEmpty,
      "a bare DIB should not decode without the wrap")
    val Some((dw, dh, _, dm)) = Multimodal.decodeImage(Multimodal.wrapDibFrame(dib))
    assert(dw == 6 && dh == 4 && dm(0) == 0.5 && dm(1) == 0.0 && dm(2) == 0.5)
    assert(Multimodal.wrapDibFrame(bmp).sameElements(bmp),
      "a complete BMP must pass through untouched")
    // and inside a container: an AVI of headerless-DIB frames decodes
    // through frameStats end to end
    val avi = Multimodal.minimalAviFrames(40000, 6, 4, 1, Seq(dib))
    val rows = Multimodal.frameStats(
      Seq((1L, "video", avi, (6, 4, "raw"))).toDF("media_id", "media_type", "blob", "meta"))
      .collect()
    assert(rows.length == 1 && rows(0).getBoolean(2) &&
      rows(0).getInt(3) == 6 && rows(0).getDouble(5) == 0.5,
      s"headerless DIB in-container decode failed: ${rows.toSeq}")
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

  test("container generators round-trip; synthesizeVideoMedia decodes at the closed forms") {
    // the decode inverts the encode, byte-for-byte containers
    assert(Multimodal.decodeVideoMeta(Multimodal.minimalMp4(2500, 640, 360, 2))
      .contains((2.5, 640, 360, 2)))
    val Some((d, w, h, s)) =
      Multimodal.decodeVideoMeta(Multimodal.minimalAvi(40000, 100, 320, 200, 3))
    assert(math.abs(d - 4.0) < 1e-9 && w == 320 && h == 200 && s == 3)

    // the synthesized media table decodes at the id-derived closed forms
    // (the same forms the q_multimodal_video oracle recomputes in SQL)
    import spark.implicits._
    val ids = Seq(0L, 2L, 3L, 7L, 9L, 10L)
    val stats = Multimodal.videoStats(
        Multimodal.synthesizeVideoMedia(ids.toDF("doc_id"), "doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getDouble(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    for (i <- ids) {
      val (dec, dur, ww, hh, tr) = stats(i)
      if (i % 7 == 0) {
        assert(!dec && dur == 0.0 && tr == 0, s"id $i: opaque row decoded")
        assert(ww == (i * 37 % 1920 + 1).toInt && hh == (i * 17 % 1080 + 1).toInt)
      } else {
        assert(dec, s"id $i: container failed to decode")
        assert(ww == (i * 37 % 1904 + 16).toInt && hh == (i * 17 % 1064 + 16).toInt)
        if (i % 2 == 0) {
          assert(dur == (i * 137 % 30000 + 1000) / 1000.0, s"id $i mp4 duration")
          assert(tr == (i / 2 % 2 + 1).toInt, s"id $i mp4 tracks")
        } else {
          assert(dur == (i % 750 + 25) * 40000 / 1e6, s"id $i avi duration")
          assert(tr == (i % 3 + 1).toInt, s"id $i avi streams")
        }
      }
    }
  }

  test("dHash: near-dup images land at small hamming, different images far; banding mines the pair") {
    import spark.implicits._
    def gradient(w: Int, h: Int, reversed: Boolean, noise: Int => Int) =
      Multimodal.minimalBmp(w, h) { (x, y) =>
        val base = if (reversed) (w - 1 - x) * 255 / (w - 1)
                   else x * 255 / (w - 1)
        val v = math.max(0, math.min(255, base + noise(x * 31 + y * 7)))
        (v << 16) | (v << 8) | v
      }
    val orig = gradient(64, 48, reversed = false, _ => 0)
    // a recompress-style perturbation: tiny deterministic per-pixel noise
    val near = gradient(64, 48, reversed = false, s => (s % 5) - 2)
    val far = gradient(64, 48, reversed = true, _ => 0)
    val Some(hOrig) = Multimodal.dHash(orig)
    val Some(hNear) = Multimodal.dHash(near)
    val Some(hFar) = Multimodal.dHash(far)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hOrig, hNear) <= 3,
      s"near-dup hamming ${ham(hOrig, hNear)} too far")
    assert(ham(hOrig, hFar) >= 20,
      s"reversed gradient hamming ${ham(hOrig, hFar)} too close")
    // undersized images have no defined cells -> fallback, never a crash
    assert(Multimodal.dHash(Multimodal.minimalBmp(4, 4)((_, _) => 0)).isEmpty)
    // the banded miner finds exactly the planted near-dup pair
    val hashes = Seq((1L, hOrig), (2L, hNear), (3L, hFar))
      .toDF("media_id", "phash")
    val pairs = Multimodal.phashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)), s"pairs: $pairs")
    assert(pairs.head._3 == ham(hOrig, hNear))
    // imagePhash fallback rows (decoded=false, phash=0) must NOT pair
    // with each other: composed with the decoded flag present, the
    // miner filters them before banding
    val withFallbacks = Seq((1L, true, hOrig), (2L, true, hNear),
        (10L, false, 0L), (11L, false, 0L), (12L, false, 0L))
      .toDF("media_id", "decoded", "phash")
    val filtered = Multimodal.phashPairs(withFallbacks, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == Set((1L, 2L)), s"fallback rows paired: $filtered")
  }

  test("audio energy hash: gain-invariant near-dups, banding mines the pair, undersized falls back") {
    // a 64-block envelope: blocks loud where the pattern bit is set
    def wav(pattern: Long, gain: Double): Array[Byte] = {
      val per = 125
      val samples = new Array[Short](64 * per)
      (0 until 64).foreach { w =>
        val amp = ((if (((pattern >> w) & 1) == 1) 16000 else 2000) * gain).toShort
        java.util.Arrays.fill(samples, w * per, (w + 1) * per, amp)
      }
      Multimodal.minimalWav(samples, 8000)
    }
    val pattern = 0x5a3cL
    val Some(hOrig) = Multimodal.decodeAudioSamples(wav(pattern, 1.0))
      .flatMap(Multimodal.audioEnergyHash(_))
    // a pure gain change (re-mastered copy) preserves EVERY energy
    // comparison — hamming 0
    val Some(hQuiet) = Multimodal.decodeAudioSamples(wav(pattern, 0.5))
      .flatMap(Multimodal.audioEnergyHash(_))
    assert(hOrig == hQuiet, "energy hash must be gain-invariant")
    // a different envelope lands far
    val Some(hOther) = Multimodal.decodeAudioSamples(wav(~pattern & 0xffffL, 1.0))
      .flatMap(Multimodal.audioEnergyHash(_))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hOrig, hOther) >= 8, s"hamming ${ham(hOrig, hOther)}")
    // the closed form the oracle uses: bit w = bit_w(p) & !bit_{w+1}(p)
    val expect = (0 until 63).map(w =>
      if (((pattern >> w) & 1) == 1 && ((pattern >> (w + 1)) & 1) == 0)
        1L << w else 0L).sum
    assert(hOrig == expect, f"hash $hOrig%x vs closed form $expect%x")
    // fewer samples than windows -> no defined blocks -> fallback
    assert(Multimodal.audioEnergyHash(Array.fill(10)(0.5)).isEmpty)
    // the SAME 4x16-band miner works on the audio hash unchanged
    val hashes = Seq((1L, true, hOrig), (2L, true, hQuiet),
        (3L, true, hOther), (9L, false, 0L))
      .toDF("media_id", "decoded", "phash")
    val pairs = Multimodal.phashPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"audio banding pairs: $pairs")
  }

  test("video frame-phash: per-frame sequence, composite-id banding finds the near-dup video") {
    import org.apache.spark.sql.functions.col
    // two 2-frame videos: media 1 and its recompressed-ish twin 2
    // (tiny per-pixel noise), media 3 a reversed-gradient stranger
    def gradFrame(seed: Long, noise: Int => Int) =
      Multimodal.minimalBmp(64, 48) { (x, y) =>
        val dy = y / 6
        val up = dy < 7 && ((seed >> dy) & 1) == 0
        val base = if (up) x * 4 else (63 - x) * 4
        val v = math.max(0, math.min(255, base + noise(x * 31 + y)))
        (v << 16) | (v << 8) | v
      }
    def avi(seed: Long, noise: Int => Int) =
      Multimodal.minimalAviFrames(40000L, 64, 48, 1,
        (0 until 2).map(k => gradFrame(seed + k, noise)))
    val media = Seq(
      (1L, "video", avi(6L, _ => 0)),
      (2L, "video", avi(6L, s => (s % 5) - 2)),
      (3L, "video", avi(0x55L, _ => 0)),
      (9L, "video", "not an avi".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "blob")
    val fp = Multimodal.videoPhash(media)
    val rows = fp.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.count(_._1 == 1L) == 2 && rows.filter(_._1 == 1L).forall(_._3))
    assert(rows.filter(_._1 == 9L).toSeq == Seq((9L, 0, false, 0L)))
    // frame-level near-dup mining through the SAME banded miner, keyed
    // by the composite (media, frame) id
    val pairs = Multimodal.phashPairs(
        fp.where(col("decoded")).select(
          (col("media_id") * 1000 + col("frame_idx")).as("media_id"),
          col("phash")), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every frame of 1 pairs with the same frame of 2; 3 pairs with none
    assert(pairs == Set((1000L, 2000L), (1001L, 2001L)),
      s"frame pairs: $pairs")
  }

  test("canonical-PCM fast path equals the JDK decode (r17): stereo16, u8, fallback") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // reference decode straight through the JDK reader — the exact
    // pre-r17 arithmetic — to differential-test the RIFF fast path
    def jdkSamples(bytes: Array[Byte]): Option[Array[Double]] = {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ch = fmt.getChannels
        val bits = fmt.getSampleSizeInBits
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = ais.read(chunk)
        while (n > 0) { buf.write(chunk, 0, n); n = ais.read(chunk) }
        val data = buf.toByteArray
        val bytesPer = bits / 8
        val frameBytes = bytesPer * ch
        val nFrames = data.length / frameBytes
        val out = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val o = f * frameBytes + c * bytesPer
            acc += (if (bits == 16)
                ((data(o + 1) << 8) | (data(o) & 0xff)).toShort / 32768.0
              else ((data(o) & 0xff) - 128) / 128.0)
            c += 1
          }
          out(f) = acc / ch
          f += 1
        }
        Some(out)
      } finally ais.close()
    }
    def wavVia(fmt: AudioFormat, pcm: Array[Byte], frames: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rnd = new scala.util.Random(7)
    // 16-bit stereo little-endian
    val n16 = 500
    val pcm16 = Array.fill(n16 * 4)(rnd.nextInt(256).toByte)
    val wav16 = wavVia(new AudioFormat(8000f, 16, 2, true, false), pcm16, n16.toLong)
    assert(Multimodal.decodeAudioSamples(wav16).map(_.toSeq) ==
      jdkSamples(wav16).map(_.toSeq))
    // 8-bit unsigned mono (the WAV-spec 8-bit encoding)
    val n8 = 300
    val pcm8 = Array.fill(n8)(rnd.nextInt(256).toByte)
    val wav8 = wavVia(new AudioFormat(8000f, 8, 1, false, false), pcm8, n8.toLong)
    assert(Multimodal.decodeAudioSamples(wav8).map(_.toSeq) ==
      jdkSamples(wav8).map(_.toSeq))
    // decodeAudio's (rate, ch, frames, dur, rms) tuple agrees too
    val Some((r16, c16, f16, _, _)) = Multimodal.decodeAudio(wav16)
    assert(r16 == 8000f && c16 == 2 && f16 == n16.toLong)
    // a non-WAV container (AU) must still decode via the JDK fallback
    val au = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(pcm16), new AudioFormat(8000f, 16, 2, true, true), n16.toLong),
        javax.sound.sampled.AudioFileFormat.Type.AU, bos)
      bos.toByteArray
    }
    assert(Multimodal.decodeAudioSamples(au).isDefined)
    // truncated data chunk (declared > present) falls back to the JDK
    // path and matches it exactly (r17 ADVICE: pin the equivalence, not
    // a tautology)
    val truncated = wav16.dropRight(40)
    assert(Multimodal.decodeAudioSamples(truncated).map(_.toSeq) ==
      jdkSamples(truncated).map(_.toSeq))
    // crafted chunk lengths must terminate, not stall the walk (r17
    // ADVICE high): an unknown chunk declaring len 0xFFFFFFF8 (toInt -8,
    // zero advance before the fix) and one declaring 0x7FFFFFFF (overrun)
    def crafted(len: Long): Array[Byte] = {
      val junk = new java.io.ByteArrayOutputStream()
      junk.write("RIFF".getBytes("US-ASCII")); junk.write(Array[Byte](36, 0, 0, 0))
      junk.write("WAVE".getBytes("US-ASCII"))
      junk.write("junk".getBytes("US-ASCII"))
      junk.write(Array[Byte](
        (len & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        ((len >> 16) & 0xff).toByte, ((len >> 24) & 0xff).toByte))
      junk.write(new Array[Byte](64))
      junk.toByteArray
    }
    for (len <- Seq(0xFFFFFFF8L, 0x7FFFFFFFL, 0x80000000L)) {
      val res = Multimodal.decodeAudioSamples(crafted(len)) // must return
      assert(res.isEmpty) // malformed container: no JDK reader accepts it
    }
  }
}
