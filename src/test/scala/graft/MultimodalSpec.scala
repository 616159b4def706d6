package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{FakeDecoder, ImageIODecoder, Multimodal}

/** Real image decode (JDK `javax.imageio`) through the distributed
  * plumbing: programmatically generated PNGs with known pixels, asserted
  * to the exact width/height/channel means; non-image bytes prove the
  * total-function fallback. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, b) => Row(id, "image", b) }, 2),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("media_kind", StringType),
        StructField("media", BinaryType))))

  test("ImageIODecoder: exact dimensions and channel means from real pixels") {
    // solid color 8×4: R=200, G=100, B=50 everywhere
    val solid = png(8, 4)((_, _) => (200 << 16) | (100 << 8) | 50)
    // half black / half white 10×10 → every channel mean 127.5
    val halves = png(10, 10)((x, _) => if (x < 5) 0x000000 else 0xffffff)
    val feats = Multimodal.extractFeatures(
      mediaDf(Seq(1L -> solid, 2L -> halves)), "doc_id", new ImageIODecoder)
      .collect().map(f => f.doc_id -> f).toMap

    val s = feats(1L)
    assert(s.width == 8 && s.height == 4)
    assert(s.bandMeans(0) == 200f && s.bandMeans(1) == 100f && s.bandMeans(2) == 50f)
    assert(s.bandMeans(3) == -1f) // no alpha channel in TYPE_INT_RGB

    val hm = feats(2L)
    assert(hm.width == 10 && hm.height == 10)
    (0 to 2).foreach(b => assert(hm.bandMeans(b) == 127.5f, s"band $b"))
  }

  test("ImageIODecoder: JPEG decodes too (JDK codec), size plausible") {
    val img = new BufferedImage(6, 3, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 6) img.setRGB(x, y, 0x808080)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    val f = new ImageIODecoder().decode(7L, "image", out.toByteArray)
    assert(f.width == 6 && f.height == 3)
    // JPEG is lossy: means close to 128, not exact
    (0 to 2).foreach(b => assert(math.abs(f.bandMeans(b) - 128f) < 8f))
  }

  test("non-image bytes fall back to the deterministic stub, never throw") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val viaReal = new ImageIODecoder().decode(3L, "audio", junk)
    val viaFake = new FakeDecoder().decode(3L, "audio", junk)
    assert(viaReal == viaFake.copy(bandMeans = viaReal.bandMeans) &&
      viaReal.bandMeans.sameElements(viaFake.bandMeans))
    // and the empty payload path
    val empty = new ImageIODecoder().decode(4L, "image", Array.empty)
    assert(empty.sizeBytes == 0L)
  }

  test("decompression-bomb guard: declared pixels above maxPixels fall back pre-alloc") {
    // a real 8x6 PNG: decodes fine by default, but a decoder whose pixel
    // ceiling is below 48 must refuse from the HEADER (no raster alloc)
    // and produce exactly the deterministic fallback features
    val small = png(8, 6)((_, _) => 0x336699)
    val ok = new ImageIODecoder().decode(9L, "image", small)
    assert(ok.width == 8 && ok.height == 6)
    val guarded = new ImageIODecoder(maxPixels = 47L).decode(9L, "image", small)
    val fake = new FakeDecoder().decode(9L, "image", small)
    assert(guarded == fake.copy(bandMeans = guarded.bandMeans) &&
      guarded.bandMeans.sameElements(fake.bandMeans))
    // a forged header declaring 1 Gpix on a tiny payload: guard must trip
    // on the declared dimensions without trying to decode the body
    val bomb = {
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      val ihdrBody = java.nio.ByteBuffer.allocate(13)
        .putInt(40000).putInt(40000) // width, height
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .array()
      val crc = new java.util.zip.CRC32()
      crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdrBody)
      val buf = java.nio.ByteBuffer.allocate(sig.length + 4 + 4 + 13 + 4)
      buf.put(sig).putInt(13).put("IHDR".getBytes("US-ASCII"))
        .put(ihdrBody).putInt(crc.getValue.toInt)
      buf.array()
    }
    val bombed = new ImageIODecoder().decode(10L, "image", bomb)
    val bombedFake = new FakeDecoder().decode(10L, "image", bomb)
    assert(bombed == bombedFake.copy(bandMeans = bombed.bandMeans) &&
      bombed.bandMeans.sameElements(bombedFake.bandMeans))
  }

  test("resizeImages: alpha survives the downscale (no black compositing)") {
    import java.awt.image.BufferedImage
    // 100x100 RGBA: fully transparent everywhere, opaque red center block
    val img = new BufferedImage(100, 100, BufferedImage.TYPE_INT_ARGB)
    for (y <- 40 until 60; x <- 40 until 60) img.setRGB(x, y, 0xffff0000)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val resized = Multimodal.resizeImages(
      mediaDf(Seq(1L -> out.toByteArray)), "doc_id", maxDim = 50).head()
    assert(resized.resized && resized.width == 50)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(resized.media))
    assert(back.getColorModel.hasAlpha, "alpha channel dropped")
    // corner stays transparent; center stays opaque red
    assert((back.getRGB(2, 2) >>> 24) == 0, "transparent corner composited")
    val center = back.getRGB(25, 25)
    assert((center >>> 24) == 0xff && ((center >> 16) & 0xff) > 200,
      f"center lost opacity/color: $center%08x")
  }

  test("resizeImages: real downscale to bounded dimensions, passthrough below the cap") {
    import spark.implicits._
    import javax.imageio.ImageIO
    import java.io.ByteArrayInputStream
    val big = png(100, 60)((x, _) => if (x < 50) 0xff0000 else 0x0000ff)
    val small = png(8, 6)((_, _) => 0x00ff00)
    val junk = "not an image at all".getBytes("UTF-8")
    val df = Seq((1L, big), (2L, small), (3L, junk)).toDF("doc_id", "media")
    val out = Multimodal.resizeImages(df, "doc_id", maxDim = 50)
      .collect().map(r => r.doc_id -> r).toMap
    // the big image really scaled: 100x60 -> 50x30, decodable PNG out
    assert(out(1L).resized && out(1L).width == 50 && out(1L).height == 30)
    val rescaled = ImageIO.read(new ByteArrayInputStream(out(1L).media))
    assert(rescaled.getWidth == 50 && rescaled.getHeight == 30)
    // small image and junk pass through byte-identical, unresized
    assert(!out(2L).resized && out(2L).media.sameElements(small))
    assert(!out(3L).resized && out(3L).media.sameElements(junk))
  }

  /** Test-only stub sampler (the old shipped fallback, now demoted to
    * test code): evenly-spaced byte windows, so the fan-out plumbing is
    * testable independent of any container format. */
  private final class WindowFrameSampler extends Multimodal.FrameSampler {
    override def sample(
        id: Long, bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])] = {
      if (bytes.isEmpty || n <= 0) Iterator.empty
      else {
        val window = math.max(bytes.length / n, 1)
        (0 until math.min(n, bytes.length)).iterator.map { i =>
          val start = math.min(i.toLong * bytes.length / n, bytes.length - 1).toInt
          (i, bytes.slice(start, math.min(start + window, bytes.length)))
        }
      }
    }
  }

  test("sampleFrames: bounded one-row-per-frame fan-out, deterministic stub") {
    import spark.implicits._
    val bytes = (0 until 100).map(_.toByte).toArray
    val df = Seq((7L, bytes), (8L, Array.empty[Byte])).toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(df, "doc_id", framesPerDoc = 4,
        sampler = new WindowFrameSampler)
      .collect()
    val by7 = frames.filter(_.doc_id == 7L).sortBy(_.frame_idx)
    assert(by7.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    // evenly spaced 25-byte windows of the payload
    assert(by7(0).frame.toSeq == (0 until 25).map(_.toByte))
    assert(by7(2).frame.toSeq == (50 until 75).map(_.toByte))
    // empty payload yields no frame rows, not nulls
    assert(!frames.exists(_.doc_id == 8L))
    // determinism across runs
    val again = Multimodal.sampleFrames(df, "doc_id", framesPerDoc = 4,
        sampler = new WindowFrameSampler)
      .collect().filter(_.doc_id == 7L).sortBy(_.frame_idx)
    assert(again.zip(by7).forall { case (a, b) => a.frame.sameElements(b.frame) })
  }

  // ---- MJPEG-in-AVI: a real video container assembled in-spec ----

  private def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Minimal but structurally honest AVI writer: RIFF('AVI ') holding a
    * LIST('hdrl') with a real 56-byte avih, a LIST('movi') with one
    * '00dc' chunk per JPEG frame (even-padded), and an 'idx1' index —
    * the layout every MJPEG-AVI producer emits. */
  private def mjpegAvi(frames: Seq[Array[Byte]], wrapInRec: Boolean = false): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32(data.length) ++ data ++ pad
    }
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ data)
    val avih = chunk("avih", le32(33333) ++ le32(0) ++ le32(0) ++ le32(16) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(16) ++ le32(16) ++ Array.fill(16)(0.toByte))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val moviData =
      if (wrapInRec) frameChunks.map(fc => list("rec ", fc)).reduce(_ ++ _)
      else frameChunks.reduce(_ ++ _)
    val movi = list("movi", moviData)
    val idx1 = chunk("idx1", frames.indices.map(i =>
      cc("00dc") ++ le32(16) ++ le32(0) ++ le32(frames(i).length))
      .reduce(_ ++ _))
    val body = cc("AVI ") ++ list("hdrl", avih) ++ movi ++ idx1
    cc("RIFF") ++ le32(body.length) ++ body
  }

  test("MjpegAviFrameSampler: real frames out of a real container, golden colors") {
    import spark.implicits._
    import java.io.ByteArrayInputStream
    // six solid-color frames; sample 3 → expect frames 0, 2, 4 by even
    // spacing, each decoding to (approximately — JPEG) its color
    val colors = Seq(0xc00000, 0x00c000, 0x0000c0, 0xc0c000, 0x00c0c0, 0xc000c0)
    val avi = mjpegAvi(colors.map(c => jpeg(16, 16, c)))
    val junk = "RIFFnot really an avi".getBytes("UTF-8")
    val df = Seq((1L, avi), (2L, junk), (3L, Array.empty[Byte]))
      .toDF("doc_id", "media")
    val out = Multimodal.sampleFrames(df, "doc_id", framesPerDoc = 3).collect()
    // junk and empty payloads: absent, not null rows
    assert(out.forall(_.doc_id == 1L))
    val got = out.sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    val expect = Seq(colors(0), colors(2), colors(4))
    got.zip(expect).foreach { case (f, c) =>
      val img = ImageIO.read(new ByteArrayInputStream(f.frame))
      assert(img != null, s"frame ${f.frame_idx} is not a decodable JPEG")
      assert(img.getWidth == 16 && img.getHeight == 16)
      val p = img.getRGB(8, 8)
      def ch(v: Int, s: Int) = (v >> s) & 0xff
      // JPEG is lossy: channels within 24 of the solid source color
      Seq(16, 8, 0).foreach(s =>
        assert(math.abs(ch(p, s) - ch(c, s)) <= 24,
          f"frame ${f.frame_idx}: got ${p & 0xffffff}%06x want $c%06x"))
    }
    // asking for more frames than exist yields exactly the frame count
    val all = Multimodal.sampleFrames(
      Seq((9L, avi)).toDF("doc_id", "media"), "doc_id", framesPerDoc = 99)
      .collect().sortBy(_.frame_idx)
    assert(all.length == 6 && all.map(_.frame_idx).toSeq == (0 until 6))
    // rec-grouped movi lists (interleaved AVIs) parse identically
    val recAvi = mjpegAvi(colors.map(c => jpeg(16, 16, c)), wrapInRec = true)
    val rec = Multimodal.sampleFrames(
      Seq((10L, recAvi)).toDF("doc_id", "media"), "doc_id", framesPerDoc = 6)
      .collect()
    assert(rec.length == 6)
  }

  test("mixed corpus through the partition-wise stage: images decode, text falls back") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(20)
    val textFeats = Multimodal.featureTable(docs, "doc_id", "text", "image")
      .collect()
    assert(textFeats.length == 20)
    // utf-8 text payloads are not images: fallback metadata, still total
    assert(textFeats.forall(_.getAs[Long]("sizeBytes") > 0L))
    val imgRow = mediaDf(Seq(100L -> png(5, 5)((_, _) => 0xff0000)))
    val f = Multimodal.extractFeatures(imgRow, "doc_id", new ImageIODecoder)
      .head()
    assert(f.width == 5 && f.bandMeans(0) == 255f && f.bandMeans(1) == 0f)
  }

  // ---- audio lane (REAL javax.sound WAV decode) ----

  /** 16-bit little-endian mono PCM sine wave wrapped as a WAV. */
  private def sineWav(freq: Double, sr: Int, ms: Int, amplitude: Double): Array[Byte] = {
    import javax.sound.sampled._
    val n = sr * ms / 1000
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / sr) * amplitude * 32767).toInt.toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioFeatures: real WAV decode — format metadata, RMS, zero-cross rate") {
    import graft.multimodal.AudioFeaturesStage
    val sr = 8000
    val freq = 440.0
    val amp = 0.5
    val wav = sineWav(freq, sr, ms = 500, amplitude = amp)
    val df = mediaDf(Seq(1L -> wav, 2L -> "definitely not audio".getBytes("UTF-8")))
    val feats = AudioFeaturesStage.audioFeatures(df, "doc_id", windows = 4)
      .collect().map(f => f.doc_id -> f).toMap

    val a = feats(1L)
    assert(a.valid)
    assert(a.sample_rate == sr && a.channels == 1)
    assert(a.n_frames == sr / 2)
    assert(math.abs(a.duration_ms - 500L) <= 1L)
    // sine RMS = amplitude / sqrt(2), in every window
    a.rms_windows.foreach(r =>
      assert(math.abs(r - amp / math.sqrt(2)) < 0.02, r))
    // a sine crosses zero 2*freq times per second
    assert(math.abs(a.zero_cross_rate - 2 * freq / sr) < 0.01, a.zero_cross_rate)

    // non-audio bytes: total fallback, never a task failure
    val b = feats(2L)
    assert(!b.valid && b.sample_rate == 0 && b.n_frames == 0L)
  }

  test("fftRadix2: golden transforms (impulse is flat, sine hits its bin)") {
    import graft.multimodal.AudioFeaturesStage.fftRadix2
    // impulse at t=0 -> |X(k)| = 1 for every bin
    val re = new Array[Double](64); val im = new Array[Double](64)
    re(0) = 1.0
    fftRadix2(re, im)
    (0 until 64).foreach { k =>
      assert(math.abs(math.hypot(re(k), im(k)) - 1.0) < 1e-12, s"bin $k")
    }
    // pure cosine at bin 5 of 64 -> energy only at bins 5 and 59 (N/2 each)
    val re2 = Array.tabulate(64)(i => math.cos(2 * math.Pi * 5 * i / 64))
    val im2 = new Array[Double](64)
    fftRadix2(re2, im2)
    (0 until 64).foreach { k =>
      val mag = math.hypot(re2(k), im2(k))
      if (k == 5 || k == 59) assert(math.abs(mag - 32.0) < 1e-9, s"bin $k: $mag")
      else assert(mag < 1e-9, s"leakage at bin $k: $mag")
    }
  }

  test("spectralFeatures: sine is tonal at its frequency, noise is flat") {
    import graft.multimodal.AudioFeaturesStage
    val sr = 8000
    val wav = sineWav(1000.0, sr, ms = 1000, amplitude = 0.5)
    // seeded white noise, same container
    val rnd = new scala.util.Random(3)
    val n = sr
    val noise = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = ((rnd.nextDouble() * 2 - 1) * 0.5 * 32767).toInt.toShort
      noise(2 * i) = (s & 0xff).toByte
      noise(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    import javax.sound.sampled._
    val out = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(noise),
      new AudioFormat(sr.toFloat, 16, 1, true, false), n.toLong),
      AudioFileFormat.Type.WAVE, out)

    val feats = AudioFeaturesStage.spectralFeatures(
      mediaDf(Seq(1L -> wav, 2L -> out.toByteArray,
        3L -> "not audio".getBytes("UTF-8"))),
      "doc_id", windows = 4, fftSize = 1024)
      .collect().map(f => f.doc_id -> f).toMap

    val tone = feats(1L)
    assert(tone.valid && tone.sample_rate == sr)
    val binHz = sr.toDouble / 1024
    tone.dominant_hz.foreach(d =>
      assert(math.abs(d - 1000.0) <= binHz, s"dominant $d"))
    tone.centroid_hz.foreach(c =>
      assert(math.abs(c - 1000.0) < 100.0, s"centroid $c"))
    tone.flatness.foreach(f => assert(f < 0.05, s"sine flatness $f"))

    val flat = feats(2L)
    assert(flat.valid)
    flat.flatness.foreach(f => assert(f > 0.3, s"noise flatness $f"))

    assert(!feats(3L).valid)
  }

  test("spectralFeatures: 8-bit and stereo WAVs hit the same tone bin") {
    import javax.sound.sampled._
    import graft.multimodal.AudioFeaturesStage
    val sr = 8000
    val n = sr
    val freq = 500.0
    val data8 = Array.tabulate(n)(i =>
      ((math.sin(2 * math.Pi * freq * i / sr) * 0.5 * 127) + 128).toInt.toByte)
    val out8 = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data8),
      new AudioFormat(sr.toFloat, 8, 1, false, false), n.toLong),
      AudioFileFormat.Type.WAVE, out8)
    val data16 = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / sr) * 0.5 * 32767).toInt.toShort
      for (c <- 0 until 2) {
        data16(4 * i + 2 * c) = (s & 0xff).toByte
        data16(4 * i + 2 * c + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val out16 = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data16),
      new AudioFormat(sr.toFloat, 16, 2, true, false), n.toLong),
      AudioFileFormat.Type.WAVE, out16)

    val feats = AudioFeaturesStage.spectralFeatures(
      mediaDf(Seq(1L -> out8.toByteArray, 2L -> out16.toByteArray)),
      "doc_id", windows = 2, fftSize = 1024)
      .collect().map(f => f.doc_id -> f).toMap
    val binHz = sr.toDouble / 1024
    Seq(1L, 2L).foreach { id =>
      val f = feats(id)
      assert(f.valid, s"doc $id")
      f.dominant_hz.foreach(d =>
        assert(math.abs(d - freq) <= binHz, s"doc $id dominant $d"))
    }
  }

  test("audioFeatures: maxBytes caps the decoded PCM per row (untrusted header)") {
    import graft.multimodal.AudioFeaturesStage
    val wav = sineWav(440.0, 8000, ms = 1000, amplitude = 0.5) // 16k PCM bytes
    val df = mediaDf(Seq(1L -> wav))
    // 4001 is deliberately NOT frame-aligned: AudioInputStream.read rounds
    // sub-frame requests to 0 without EOF, so an unaligned cap used to
    // spin readNBytes forever — the decoder must frame-align it
    val capped = AudioFeaturesStage.audioFeatures(df, "doc_id", windows = 2,
      maxBytes = 4001).head()
    assert(capped.valid)
    assert(capped.n_frames == 2000L) // floor(4001/2) bytes -> 2000 frames
  }

  test("audioFeatures: 8-bit unsigned and stereo WAVs decode for real") {
    import javax.sound.sampled._
    import graft.multimodal.AudioFeaturesStage
    val sr = 8000
    val n = sr / 2
    // 8-bit WAV is PCM_UNSIGNED by spec: bytes are (sample*127 + 128)
    val data8 = Array.tabulate(n)(i =>
      ((math.sin(2 * math.Pi * 440 * i / sr) * 0.5 * 127) + 128).toInt.toByte)
    val out8 = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data8),
      new AudioFormat(sr.toFloat, 8, 1, false, false), n.toLong),
      AudioFileFormat.Type.WAVE, out8)
    // stereo 16-bit: same sine in both channels -> mono fold is the sine
    val data16 = new Array[Byte](n * 4)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / sr) * 0.5 * 32767).toInt.toShort
      for (c <- 0 until 2) {
        data16(4 * i + 2 * c) = (s & 0xff).toByte
        data16(4 * i + 2 * c + 1) = ((s >> 8) & 0xff).toByte
      }
    }
    val out16 = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(data16),
      new AudioFormat(sr.toFloat, 16, 2, true, false), n.toLong),
      AudioFileFormat.Type.WAVE, out16)

    val feats = AudioFeaturesStage.audioFeatures(
      mediaDf(Seq(1L -> out8.toByteArray, 2L -> out16.toByteArray)),
      "doc_id", windows = 2)
      .collect().map(f => f.doc_id -> f).toMap
    val a8 = feats(1L)
    assert(a8.valid && a8.sample_rate == sr && a8.channels == 1)
    assert(math.abs(a8.rms_windows(0) - 0.5 / math.sqrt(2)) < 0.03, a8.rms_windows(0))
    val st = feats(2L)
    assert(st.valid && st.channels == 2 && st.n_frames == n.toLong)
    assert(math.abs(st.rms_windows(0) - 0.5 / math.sqrt(2)) < 0.02, st.rms_windows(0))
    assert(math.abs(st.zero_cross_rate - 2 * 440.0 / sr) < 0.01)
  }
}
