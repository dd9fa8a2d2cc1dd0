package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq((0L, "a" * 2500), (1L, "short doc"))
    .toDF("doc_id", "text")

  test("attachBinary: opaque bytes + typed metadata struct") {
    val m = Multimodal.attachBinary(docs, "doc_id", "text", "text/plain")
    val r = m.filter($"id" === 0L).head()
    val meta = r.getStruct(r.fieldIndex("media_meta"))
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 2500L)
    assert(meta.getAs[String]("digest").length == 32)
  }

  test("frameSample explodes payload into fixed-size chunks") {
    val frames = Multimodal.frameSample(
      Multimodal.attachBinary(docs, "doc_id", "text"), chunkBytes = 1024)
    val counts = frames.groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts(0L) == 3) // 2500 bytes -> 3 chunks
    assert(counts(1L) == 1)
    val sizes = frames.filter($"id" === 0L)
      .select(length($"frame")).as[Int].collect().sorted
    assert(sizes.toSeq == Seq(452, 1024, 1024))
  }

  test("fingerprintImage → imagePixelStats: REAL ImageIO round-trip, " +
    "decoded intensities equal the md5 hex ascii codes") {
    val imgs = Multimodal.fingerprintImage(docs, "doc_id", "text")
    // the media column holds an actual PNG (magic bytes)
    val bytes = imgs.filter($"id" === 0L).select("media")
      .as[Array[Byte]].head()
    assert(bytes.take(8).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val stats = Multimodal.imagePixelStats(imgs).orderBy("id")
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)].collect()
    val expected = docs.as[(Long, String)].collect().map { case (id, t) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val vs = hex.map(_.toLong)
      (id, true, 8, 4, 32L, vs.sum, vs.min, vs.max)
    }.sortBy(_._1).toSeq
    assert(stats.toSeq == expected)
  }

  test("imagePixelStats decodes a hand-built PNG exactly and falls back " +
    "to the byte stub for non-image bytes") {
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pix = Seq(0, 7, 255, 128, 64, 200)
    pix.zipWithIndex.foreach { case (v, i) =>
      img.setRGB(i % 3, i / 3, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val rows = Seq((1L, out.toByteArray), (2L, "not an image".getBytes))
      .toDF("id", "media")
    val got = Multimodal.imagePixelStats(rows).orderBy("id")
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, true, 3, 2, 6L, pix.map(_.toLong).sum, 0L, 255L)))
    val raw = "not an image".getBytes.map(b => (b & 0xff).toLong)
    assert(got(1) == ((2L, false, raw.length, 1, raw.length.toLong,
      raw.sum, raw.min, raw.max)))
  }

  test("fingerprintWav → audioSampleStats: REAL AudioSystem round-trip, " +
    "decoded samples equal the md5 hex ascii codes; non-audio falls " +
    "back to the byte stub") {
    val wavs = Multimodal.fingerprintWav(docs, "doc_id", "text")
    // the media column holds an actual RIFF/WAVE file
    val bytes = wavs.filter($"id" === 0L).select("media")
      .as[Array[Byte]].head()
    assert(new String(bytes.take(4)) == "RIFF" &&
      new String(bytes.slice(8, 12)) == "WAVE")
    val stats = Multimodal.audioSampleStats(wavs).orderBy("id")
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)].collect()
    val expected = docs.as[(Long, String)].collect().map { case (id, t) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val vs = hex.map(_.toLong)
      (id, true, 8000, 1, 32L, vs.sum, vs.min, vs.max)
    }.sortBy(_._1).toSeq
    assert(stats.toSeq == expected)
    val junk = Seq((9L, "not audio at all".getBytes)).toDF("id", "media")
    val fb = Multimodal.audioSampleStats(junk)
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)].head()
    assert(!fb._2 && fb._5 == "not audio at all".getBytes.length.toLong)

    // non-16-bit-LE layouts CONVERT before the sample loop instead of
    // pairing bytes into garbage (the r15 wavDeltaSketches fix applied
    // to the stats face): an 8-bit unsigned WAV of a known ramp decodes
    // to the JDK-converted values ((v-128) << 8), not byte salad
    val ramp = Array.tabulate(16)(i => (i * 16).toByte) // u8 0,16,...,240
    val u8fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(ramp), u8fmt, ramp.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val u8 = Multimodal.audioSampleStats(
      Seq((10L, bos.toByteArray)).toDF("id", "media"))
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)].head()
    // expected = the JDK's OWN u8→s16 conversion of the same stream
    // (its upscale is not a bare shift — low bits are replicated), so
    // the assertion pins the stats to a real converted decode rather
    // than to byte salad from the raw u8 stream
    val raw16 = {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          8000f, 16, 1, 2, 8000f, false), src).readAllBytes()
    }
    val conv = (0 until raw16.length / 2).map(i =>
      (((raw16(2 * i) & 0xff) | (raw16(2 * i + 1).toInt << 8))
        .toShort).toLong)
    assert(u8._2 && u8._5 == 16L, s"8-bit WAV must decode: $u8")
    assert((u8._6, u8._7, u8._8) == ((conv.sum, conv.min, conv.max)),
      s"8-bit samples must arrive JDK-converted to 16-bit LE: $u8")
    // sanity that the conversion is sample-faithful, not salad: the
    // ramp's extremes land on the converted extremes of u8 0 and 240
    assert(conv.min == -32768L && conv.indexOf(conv.max) == 15)
  }

  test("resizeImages: nearest-neighbor resample keeps exactly the " +
    "predicted source pixels through a full re-encode; non-image " +
    "passes through") {
    val imgs = Multimodal.fingerprintImage(docs, "doc_id", "text")
    val resized = Multimodal.resizeImages(imgs, dstW = 4, dstH = 2)
    val stats = Multimodal.imagePixelStats(resized).orderBy("id")
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)].collect()
    val expected = docs.as[(Long, String)].collect().map { case (id, t) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // dest (x,y) <- src (2x,2y) <- hex index 16y + 2x
      val vs = for (y <- 0 until 2; x <- 0 until 4)
        yield hex.charAt(16 * y + 2 * x).toLong
      (id, true, 4, 2, 8L, vs.sum, vs.min, vs.max)
    }.sortBy(_._1).toSeq
    assert(stats.toSeq == expected)
    val junk = Seq((9L, "not an image".getBytes)).toDF("id", "media")
    val fb = Multimodal.resizeImages(junk, 4, 2)
      .select("resized", "media").as[(Boolean, Array[Byte])].head()
    assert(!fb._1 && fb._2.toSeq == "not an image".getBytes.toSeq)
  }

  test("fingerprintVideo → videoFrameStats: chunk-walking demux splits " +
    "the concatenated container exactly; every frame decodes to its " +
    "predicted pixels; non-video emits nothing") {
    val vids = Multimodal.fingerprintVideo(docs, "doc_id", "text")
    val got = Multimodal.videoFrameStats(vids).orderBy("id", "frame_id")
      .as[(Long, Long, Int, Int, Long, Long, Long, Long)].collect()
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      Seq(md5hex(t), md5hex(md5hex(t))).zipWithIndex.map { case (hex, f) =>
        val vs = hex.map(_.toLong)
        (id, f.toLong, 8, 4, 32L, vs.sum, vs.min, vs.max)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(got.toSeq == expected)
    assert(got.count(_._1 == 0L) == 2) // exactly two frames demuxed
    val junk = Seq((9L, "no frames here".getBytes)).toDF("id", "media")
    assert(Multimodal.videoFrameStats(junk).count() == 0L)
  }

  test("audioEnergyWindows: exact windowed energy over decoded PCM; " +
    "non-audio rows emit nothing") {
    val wavs = Multimodal.fingerprintWav(docs, "doc_id", "text")
    val got = Multimodal.audioEnergyWindows(wavs, windowSamples = 8)
      .orderBy("id", "window_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    val expected = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      val vs = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .map(_.toLong)
      vs.grouped(8).zipWithIndex.map { case (w, wi) =>
        (id, wi.toLong, w.length.toLong, w.map(v => v * v).sum, w.max)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    assert(got.toSeq == expected)
    assert(got.count(_._1 == 0L) == 4) // 32 samples, window 8
    val junk = Seq((9L, "junk".getBytes)).toDF("id", "media")
    assert(Multimodal.audioEnergyWindows(junk).count() == 0L)
  }

  test("decodeAndFeaturize (stub fallback): deterministic normalized " +
    "features for non-image bytes") {
    val feats = Multimodal.decodeAndFeaturize(
      Multimodal.attachBinary(docs, "doc_id", "text"), dim = 16)
    val f = feats.filter($"id" === 0L).select("features")
      .as[Seq[Float]].head()
    assert(f.size == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-4) // L1 normalized
    // deterministic: same input -> same features
    val f2 = Multimodal.decodeAndFeaturize(
      Multimodal.attachBinary(docs, "doc_id", "text"), dim = 16)
      .filter($"id" === 0L).select("features").as[Seq[Float]].head()
    assert(f == f2)
  }

  test("decodeAndFeaturize (REAL image path): luminance histogram of the " +
    "decoded PNG equals the histogram of the md5 ascii codes") {
    val media = Multimodal.fingerprintImage(docs, "doc_id", "text")
    val f = Multimodal.decodeAndFeaturize(media, dim = 16)
      .filter($"id" === 0L).select("features").as[Seq[Float]].head()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(docs.filter($"doc_id" === 0L).select("text").as[String]
        .head().getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = new Array[Float](16)
    // gray (v,v,v) has luminance exactly v; bin = v*16/256
    hex.take(32).foreach(c => expect(c.toInt * 16 / 256) += 1f / 32)
    assert(f == expect.toSeq)
  }

  test("jpegRoundTrip: geometry exact, src_sum exact, decode error " +
    "inside the gated bounds, deterministic across runs") {
    val got = Multimodal.jpegRoundTrip(docs, "doc_id", "text")
      .select("id", "decoded", "width", "height", "n_pixels", "src_sum",
        "sum_err", "max_pix_err")
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, decoded, w, h, np, srcSum, sumErr, maxErr) =>
      assert(decoded && w == 8 && h == 4 && np == 32L, s"id=$id geometry")
      assert(sumErr >= 0 && sumErr <= 16, s"id=$id sum_err=$sumErr")
      assert(maxErr >= 0 && maxErr <= 2, s"id=$id max_pix_err=$maxErr")
    }
    // src_sum is the md5 hex ascii sum — exact, decode-independent
    val expectSums = docs.as[(Long, String)].collect().map { case (id, t) =>
      id -> java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(32).map(_.toLong).sum
    }.toMap
    got.foreach { case (id, _, _, _, _, srcSum, _, _) =>
      assert(srcSum == expectSums(id), s"id=$id src_sum")
    }
    val again = Multimodal.jpegRoundTrip(docs, "doc_id", "text")
      .select("id", "decoded", "width", "height", "n_pixels", "src_sum",
        "sum_err", "max_pix_err")
      .as[(Long, Boolean, Int, Int, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == again.toSeq)
  }

  test("muxAvi/demuxAvi: frames round-trip bitwise through the RIFF " +
    "container (odd and even sizes); non-AVI and truncated bytes " +
    "demux to empty, never throw") {
    val frames = Seq(
      Array.tabulate(101)(i => (i * 7 + 3).toByte), // odd → pad byte
      Array.tabulate(256)(i => (i * 13 + 1).toByte))
    val avi = Multimodal.muxAvi(frames, width = 8, height = 4)
    // well-formed RIFF: declared size is total - 8
    assert(avi.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
    val declared = (avi(4) & 0xffL) | ((avi(5) & 0xffL) << 8) |
      ((avi(6) & 0xffL) << 16) | ((avi(7) & 0xffL) << 24)
    assert(declared == avi.length - 8)
    val back = Multimodal.demuxAvi(avi)
    assert(back.length == 2)
    assert(back(0).toSeq == frames(0).toSeq && back(1).toSeq == frames(1).toSeq)
    assert(Multimodal.demuxAvi("not an avi at all".getBytes).isEmpty)
    assert(Multimodal.demuxAvi(avi.take(40)).isEmpty) // truncated header
    assert(Multimodal.demuxAvi(null).isEmpty)
  }

  test("aviRoundTrip: both frames survive mux→demux→decode with exact " +
    "geometry, exact src sums (md5 and md5∘md5 ascii), and decode " +
    "error inside the q_multimodal_jpeg bounds") {
    val got = Multimodal.aviRoundTrip(docs, "doc_id", "text")
      .select("id", "frame_id", "decoded", "width", "height", "n_pixels",
        "src_sum", "sum_err", "max_pix_err")
      .as[(Long, Long, Boolean, Int, Int, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.length == 4) // 2 docs × 2 frames
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexOf(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = docs.as[(Long, String)].collect().toMap
    got.foreach { case (id, fid, decoded, w, h, np, srcSum, sumErr, maxErr) =>
      val h0 = hexOf(texts(id))
      val hex = if (fid == 0L) h0 else hexOf(h0)
      assert(decoded && w == 8 && h == 4 && np == 32L)
      assert(srcSum == hex.map(_.toInt).sum.toLong)
      assert(sumErr >= 0 && sumErr <= 16, s"sum_err $sumErr out of gate")
      assert(maxErr >= 0 && maxErr <= 2, s"max_pix_err $maxErr out of gate")
    }
  }

  test("decodeAndFeaturize (REAL video path): AVI bytes demux and the " +
    "histogram equals the luminance histogram of both decoded frames") {
    def jpegFrame(hex: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 32).foreach(i =>
        img.getRaster.setSample(i % 8, i / 8, 0, hex.charAt(i).toInt))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def hexOf(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val texts = docs.as[(Long, String)].collect().toSeq
    val frames = texts.map { case (id, text) =>
      val h0 = hexOf(text)
      (id, Seq(jpegFrame(h0), jpegFrame(hexOf(h0))))
    }
    val aviMedia = frames
      .map { case (id, fs) => (id, Multimodal.muxAvi(fs, 8, 4)) }
      .toDF("id", "media")
    val got = Multimodal.decodeAndFeaturize(aviMedia, dim = 16)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    // expected: decode the SAME jpeg bytes directly and bin luminance
    // over both frames' 64 pixels
    frames.foreach { case (id, fs) =>
      val expect = new Array[Float](16)
      fs.foreach { fb =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(fb))
        for (y <- 0 until 4; x <- 0 until 8) {
          val rgb = img.getRGB(x, y)
          val lum = (299 * ((rgb >> 16) & 0xff) +
            587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
          expect(lum * 16 / 256) += 1f / 64
        }
      }
      assert(got(id) == expect.toSeq, s"doc $id histogram diverged")
    }
  }
}
