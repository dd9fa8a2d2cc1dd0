package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages (north star in BASELINE.json).
  *
  * Every modality now has a REAL codec path with zero new dependencies:
  * images via `javax.imageio` (PNG lossless round-trip, JPEG under a
  * bounded-loss contract), audio via `javax.sound.sampled` (RIFF/WAVE
  * 16-bit PCM), and video as MJPEG-in-AVI (hand-written RIFF muxer +
  * chunk-tree demuxer around ImageIO JPEG frames — see [[muxAvi]]).
  * Bytes no codec accepts fall back to a clearly-labeled deterministic
  * byte-histogram stand-in (the mixed-corpus contract: never crash a
  * partition on undecodable data).
  */
object Multimodal {

  /** ImageIO defaults to DISK-backed stream caches — one temp file per
    * encode/decode, pure churn for the small in-memory payloads these
    * operators move. Flip it to memory once per executor; idempotent.
    */
  @transient private lazy val imageIoNoCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Typed metadata carried with every media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("digest", StringType)))

  /** Attach a binary media column + typed metadata. (Testdata has no real
    * media, so bytes are the utf-8 image of `textCol` — the schema and
    * lineage are what matter.)
    */
  def attachBinary(df: DataFrame, idCol: String, textCol: String,
      mime: String = "application/octet-stream"): DataFrame = {
    val bin = to_binary(col(textCol), lit("utf-8"))
    df.select(col(idCol).as("id"), bin.as("media"),
      struct(lit(mime).as("mime"),
        length(bin).cast(LongType).as("n_bytes"),
        md5(bin).as("digest")).as("media_meta"))
  }

  /** Frame/chunk sampling: split the payload into fixed-size chunks and
    * explode — the video-frame-sample shape (1 row in → N frames out),
    * pure column ops, no UDF.
    */
  def frameSample(df: DataFrame, chunkBytes: Int = 1024): DataFrame = {
    val n = ceil(length(col("media")).cast(DoubleType) / chunkBytes)
      .cast(IntegerType)
    df.withColumn("frame_id", explode(sequence(lit(0), greatest(n, lit(1)) - 1)))
      .withColumn("frame",
        substr(col("media"), (col("frame_id") * chunkBytes + 1).cast(IntegerType),
          lit(chunkBytes)))
  }

  /** Feature-extraction output schema: id + fixed-width float vector. */
  def featureSchema(dim: Int): StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** REAL IMAGE CODEC ======================================================
    * `javax.imageio` ships in the JVM, so the image modality gets a real
    * encode/decode path with zero new dependencies. The testdata has no
    * media files, so [[fingerprintImage]] manufactures a REAL PNG per
    * document — pixels are the ASCII codes of the document's md5 hex
    * (32 values, laid out 8×4, r=g=b) — and [[imagePixelStats]] decodes
    * it back through `ImageIO.read`. PNG is lossless, so the decoded
    * intensities must equal the md5 character codes, which DuckDB can
    * compute straight from `md5(text)`: the codec round-trip itself is
    * oracle-checked (`q_multimodal_decode`), not pinned.
    */

  /** Manufacture a real PNG per row: an 8×4 grayscale-in-RGB image whose
    * pixel intensities are the ASCII codes of `md5(textCol)`'s 32 hex
    * chars, encoded through `ImageIO`. Encoded BYTES are
    * encoder-version-dependent; only the decoded PIXELS are contracted
    * (PNG is lossless). Output: (id, media, media_meta).
    */
  def fingerprintImage(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    fingerprintImageHex(
      df.select(col(idCol),
        md5(to_binary(col(textCol), lit("utf-8"))).as("__hex")),
      idCol, "__hex")

  /** [[fingerprintImage]] from a caller-supplied 32-hex-char column
    * instead of `md5(text)` — lets a query manufacture PERTURBED
    * variants (e.g. one hex position rewritten) whose pixels stay
    * md5-derivable in SQL, the seam `q_image_dedup` plants its
    * near-duplicates through.
    */
  def fingerprintImageHex(df: DataFrame, idCol: String,
      hexCol: String): DataFrame = {
    val png = udf { (hex: String) =>
      imageIoNoCache
      pngOf(hex)
    }
    df.select(col(idCol).as("id"), png(col(hexCol)).as("media"))
      .select(col("id"), col("media"),
        struct(lit("image/png").as("mime"),
          length(col("media")).cast(LongType).as("n_bytes"),
          md5(col("media")).as("digest")).as("media_meta"))
  }

  /** Decode `media` with `ImageIO.read` (PNG/BMP/GIF/JPEG) and emit
    * per-image pixel statistics over the red channel (r=g=b for
    * [[fingerprintImage]] output): `(id, decoded, width, height,
    * n_pixels, sum_intensity, min_intensity, max_intensity)`.
    *
    * Bytes that are NOT a decodable image fall back to the deterministic
    * stub (raw bytes as a 1×n_bytes "image", `decoded = false`) instead
    * of failing the partition — the mixed-corpus contract, spec-pinned.
    * Same `mapPartitions` batch shape as [[decodeAndFeaturize]].
    */
  def imagePixelStats(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("sum_intensity", LongType),
      StructField("min_intensity", LongType),
      StructField("max_intensity", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sum, mn, mx) = (0L, 255L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = (img.getRGB(x, y) >> 16) & 0xff
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            Row(id, true, w, h, w.toLong * h, sum, mn, mx)
          } else {
            // STUB fallback: raw bytes as pixels — keeps non-image rows
            // flowing with the same schema
            var (sum, mn, mx) = (0L, 255L, 0L)
            var i = 0
            while (i < bytes.length) {
              val v = (bytes(i) & 0xff).toLong
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            Row(id, false, bytes.length, 1, bytes.length.toLong, sum,
              if (bytes.isEmpty) 0L else mn, mx)
          }
        }
      }(enc)
      .toDF("id", "decoded", "width", "height", "n_pixels",
        "sum_intensity", "min_intensity", "max_intensity")
  }

  /** REAL JPEG CODEC: encode the 8×4 md5-fingerprint grayscale through
    * `ImageIO`'s JPEG writer at explicit quality 1.0, decode it back,
    * and emit fidelity stats against the exact source pixels. JPEG is
    * LOSSY, so unlike the PNG path the decoded values are not
    * bit-contracted; what IS contracted (and what the oracle checks):
    * the geometry survives exactly, the source-pixel sum is exact
    * integer arithmetic both engines compute from `md5(text)`, and the
    * decode error is within a fixed bound (measured ≤1/pixel and ≤5
    * total at q=1.0 on this codec; the query gates at ≤2 and ≤16).
    * Output: `(id, decoded, width, height, n_pixels, src_sum, sum_err,
    * max_pix_err)` — `sum_err`/`max_pix_err` are decode-dependent exact
    * ints for specs; queries reduce them to bounded booleans for the
    * oracle.
    */
  def jpegRoundTrip(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("src_sum", LongType),
      StructField("sum_err", LongType),
      StructField("max_pix_err", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col(idCol).cast(LongType).as("id"),
      md5(to_binary(col(textCol), lit("utf-8"))).as("hex"))
      .select(col("id"), col("hex"))
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { r =>
          val id = r.getLong(0)
          val hex = r.getString(1)
          val src = new Array[Int](32)
          val img = new java.awt.image.BufferedImage(8, 4,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var i = 0
          var srcSum = 0L
          while (i < 32) {
            src(i) = hex.charAt(i).toInt & 0xff
            srcSum += src(i)
            img.getRaster.setSample(i % 8, i / 8, 0, src(i))
            i += 1
          }
          val w = javax.imageio.ImageIO
            .getImageWritersByFormatName("jpg").next()
          val p = w.getDefaultWriteParam
          p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(1.0f)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          w.setOutput(ios)
          w.write(null, new javax.imageio.IIOImage(img, null, null), p)
          ios.close(); w.dispose()
          val dec =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bos.toByteArray))
            catch { case scala.util.control.NonFatal(_) => null }
          if (dec != null && dec.getWidth == 8 && dec.getHeight == 4) {
            var (decSum, maxErr) = (0L, 0L)
            var j = 0
            while (j < 32) {
              val v = dec.getRaster.getSample(j % 8, j / 8, 0)
              decSum += v
              val e = math.abs(v - src(j)).toLong
              if (e > maxErr) maxErr = e
              j += 1
            }
            Row(id, true, dec.getWidth, dec.getHeight, 32L, srcSum,
              math.abs(decSum - srcSum), maxErr)
          } else {
            Row(id, false, if (dec == null) 0 else dec.getWidth,
              if (dec == null) 0 else dec.getHeight, 0L, srcSum, -1L, -1L)
          }
        }
      }(enc)
      .toDF("id", "decoded", "width", "height", "n_pixels", "src_sum",
        "sum_err", "max_pix_err")
  }

  /** Image RESIZE — the remaining op of the multimodal quartet
    * (decode / feature-extract / resize / frame-sample): decode `media`
    * through `ImageIO.read`, nearest-neighbor resample to
    * `dstW`×`dstH` with EXPLICIT integer index mapping
    * (`srcX = x·srcW / dstW`, floor division — deterministic and
    * SQL-reproducible, unlike a library transform's half-pixel
    * convention), re-encode through `ImageIO.write`. Output media is a
    * real PNG again, so downstream stages ([[imagePixelStats]],
    * [[frameSample]]) compose unchanged — `q_multimodal_resize` chains
    * encode→decode→resample→encode→decode and the oracle still predicts
    * every pixel. Non-image bytes pass through untouched
    * (`resized = false`), mirroring the other fallbacks.
    */
  def resizeImages(df: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    require(dstW > 0 && dstH > 0, "target dimensions must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("resized", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img != null) {
            val (sw, sh) = (img.getWidth, img.getHeight)
            val out = new java.awt.image.BufferedImage(dstW, dstH,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < dstH) {
              var x = 0
              while (x < dstW) {
                out.setRGB(x, y, img.getRGB(x * sw / dstW, y * sh / dstH))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(id, bos.toByteArray, true, dstW, dstH)
          } else Row(id, bytes, false, 0, 0)
        }
      }(enc)
      .toDF("id", "media", "resized", "width", "height")
  }

  /** VIDEO (container demux + per-frame decode) =============================
    * No video codec ships in the JVM, so the honest real path is the
    * container layer: [[fingerprintVideo]] builds a 2-frame "video" as
    * CONCATENATED PNGs (frame 0 from `md5(text)`, frame 1 from
    * `md5(md5(text))` — both SQL-expressible), and [[videoFrameStats]]
    * DEMUXES by scanning for the 8-byte PNG signature and decodes every
    * frame through `ImageIO.read` — real container splitting, real
    * per-frame decode, per-frame stats oracle-checked
    * (`q_multimodal_video`). A real codec (H.264 …) would replace the
    * signature scan with its own demuxer; everything downstream is
    * unchanged.
    */

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngOf(hex: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 32) {
      val v = hex.charAt(i).toInt & 0xff
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Manufacture a 2-frame concatenated-PNG "video" per row. */
  def fingerprintVideo(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val h0 = md5(to_binary(col(textCol), lit("utf-8")))
    val h1 = md5(to_binary(h0, lit("utf-8")))
    fingerprintVideoHex(
      df.select(col(idCol), h0.as("__h0"), h1.as("__h1")),
      idCol, "__h0", "__h1")
  }

  /** [[fingerprintVideo]] from caller-supplied per-frame hex columns —
    * the video counterpart of [[fingerprintImageHex]], so a query can
    * plant PERTURBED near-duplicate videos whose frame pixels stay
    * md5-derivable in SQL (`q_video_dedup`).
    */
  def fingerprintVideoHex(df: DataFrame, idCol: String,
      hex0Col: String, hex1Col: String): DataFrame = {
    val video = udf { (hex0: String, hex1: String) =>
      if (hex0 == null || hex1 == null) null
      else {
        imageIoNoCache
        pngOf(hex0) ++ pngOf(hex1)
      }
    }
    df.select(col(idCol).as("id"),
      video(col(hex0Col), col(hex1Col)).as("media"))
      .select(col("id"), col("media"),
        struct(lit("video/x-concat-png").as("mime"),
          length(col("media")).cast(LongType).as("n_bytes"),
          md5(col("media")).as("digest")).as("media_meta"))
  }

  /** Demux a concatenated-PNG container into per-frame byte slices by
    * WALKING THE CHUNK STRUCTURE (length + type + data + crc, until
    * IEND) — a naive signature scan could false-split on magic bytes
    * inside compressed IDAT data. Bytes with no leading PNG signature
    * demux to zero frames. (The [[videoFrameStats]] demuxer, extracted
    * so [[ImageDedup.videoFrameNearDupPairs]] reuses it.)
    */
  private[operators] def demuxPngFrames(
      bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Seq.empty
    def sigAt(o: Int): Boolean = o + PngSig.length <= bytes.length && {
      var j = 0
      while (j < PngSig.length && bytes(o + j) == PngSig(j)) j += 1
      j == PngSig.length
    }
    def pngEnd(off: Int): Int = {
      var p = off + PngSig.length
      while (p + 8 <= bytes.length) {
        val len = ((bytes(p) & 0xff) << 24) |
          ((bytes(p + 1) & 0xff) << 16) |
          ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        // a chunk length is a 31-bit unsigned value; malformed bytes
        // (negative after the signed read, or pointing past the buffer)
        // end the walk at the buffer instead of spinning or indexing
        // out of bounds
        if (len < 0 || len > bytes.length - p) return bytes.length
        val isEnd = bytes(p + 4) == 'I' && bytes(p + 5) == 'E' &&
          bytes(p + 6) == 'N' && bytes(p + 7) == 'D'
        p += 8 + len + 4
        if (isEnd) return math.min(p, bytes.length)
      }
      bytes.length
    }
    Iterator.unfold(0) { o =>
      if (sigAt(o)) { val e = pngEnd(o); Some(((o, e), e)) } else None
    }.map { case (lo, hi) =>
      java.util.Arrays.copyOfRange(bytes, lo, hi)
    }.toSeq
  }

  /** Demux a concatenated-PNG container and decode every frame:
    * `(id, frame_id, width, height, n_pixels, sum_intensity,
    * min_intensity, max_intensity)` — 1 row in, n_frames out, the
    * [[frameSample]] shape with a REAL per-frame decode behind it.
    * Rows with no PNG signature emit nothing.
    */
  def videoFrameStats(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("sum_intensity", LongType),
      StructField("min_intensity", LongType),
      StructField("max_intensity", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        imageIoNoCache
        rows.flatMap { r =>
          val id = r.getLong(0)
          demuxPngFrames(r.getAs[Array[Byte]](1)).zipWithIndex.flatMap {
            case (frame, fi) =>
              val img =
                try javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(frame))
                catch { case scala.util.control.NonFatal(_) => null }
              if (img == null) None
              else {
                val (w, h) = (img.getWidth, img.getHeight)
                var (sum, mn, mx) = (0L, 255L, 0L)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val v = (img.getRGB(x, y) >> 16) & 0xff
                    sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                    x += 1
                  }
                  y += 1
                }
                Some(Row(id, fi.toLong, w, h, w.toLong * h, sum, mn, mx))
              }
          }
        }
      }(enc)
      .toDF("id", "frame_id", "width", "height", "n_pixels",
        "sum_intensity", "min_intensity", "max_intensity")
  }

  /** REAL VIDEO CONTAINER: MJPEG-in-AVI ====================================
    * The JVM ships no video codec, but MJPEG-in-AVI needs none: frames
    * are plain JPEGs (ImageIO, the [[jpegRoundTrip]] codec) and the
    * container is RIFF — a length-prefixed chunk tree simple enough to
    * write and walk by hand, the [[fingerprintWav]] pattern. So the
    * video modality gets a REAL end-to-end path with zero new
    * dependencies: [[muxAvi]] writes a standard minimal AVI
    * (hdrl/avih/strl/strh/strf + movi + idx1, all little-endian),
    * [[demuxAvi]] recovers the frames by walking the chunk tree (not by
    * signature-scanning — JPEG magic can occur inside entropy-coded
    * data), and [[aviRoundTrip]] drives build→encode→mux→demux→decode
    * per row and emits the [[jpegRoundTrip]] bounded-loss certificate
    * per frame (`q_multimodal_video_real`).
    */

  private def u32le(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4); s.getBytes("US-ASCII")
  }

  /** Mux JPEG frames into a minimal standard MJPEG AVI: RIFF('AVI ')
    * containing LIST('hdrl'){avih, LIST('strl'){strh('vids'/'MJPG'),
    * strf(BITMAPINFOHEADER)}}, LIST('movi'){'00dc' frames, even-padded},
    * and an idx1 index (AVIIF_KEYFRAME — every MJPEG frame is one).
    */
  def muxAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val out = new java.io.ByteArrayOutputStream()
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val b = new Array[Byte](8 + payload.length + pad)
      System.arraycopy(fcc(id), 0, b, 0, 4)
      System.arraycopy(u32le(payload.length.toLong), 0, b, 4, 4)
      System.arraycopy(payload, 0, b, 8, payload.length)
      b
    }
    def list(listType: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(listType) ++ payload)
    val maxFrame = frames.iterator.map(_.length).max
    val avih = Array.concat(
      u32le(1000000L / fps), // microseconds per frame
      u32le(maxFrame.toLong * fps), // max bytes/sec (upper bound)
      u32le(0), // padding granularity
      u32le(0x10), // AVIF_HASINDEX
      u32le(frames.length.toLong), u32le(0), // total frames, initial
      u32le(1), // one stream
      u32le(maxFrame.toLong), // suggested buffer
      u32le(width.toLong), u32le(height.toLong),
      u32le(0), u32le(0), u32le(0), u32le(0)) // reserved
    val strh = Array.concat(
      fcc("vids"), fcc("MJPG"),
      u32le(0), u16le(0), u16le(0), u32le(0), // flags, prio, lang, init
      u32le(1), u32le(fps.toLong), // scale, rate → fps
      u32le(0), u32le(frames.length.toLong), // start, length (frames)
      u32le(maxFrame.toLong), u32le(0xffffffffL), u32le(0), // buf, quality, sampleSize
      u16le(0), u16le(0), u16le(width), u16le(height)) // rcFrame
    val strf = Array.concat(
      u32le(40), u32le(width.toLong), u32le(height.toLong),
      u16le(1), u16le(24), fcc("MJPG"),
      u32le(width.toLong * height * 3),
      u32le(0), u32le(0), u32le(0), u32le(0))
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    // movi payload + idx1 offsets (relative to the 'movi' fourcc,
    // the widely-used convention)
    val moviBody = new java.io.ByteArrayOutputStream()
    val idx = new java.io.ByteArrayOutputStream()
    var off = 4L // after the 'movi' list type
    frames.foreach { f =>
      val c = chunk("00dc", f)
      moviBody.write(c)
      idx.write(fcc("00dc")); idx.write(u32le(0x10)) // AVIIF_KEYFRAME
      idx.write(u32le(off)); idx.write(u32le(f.length.toLong))
      off += c.length
    }
    val movi = list("movi", moviBody.toByteArray)
    val riffPayload = fcc("AVI ") ++ hdrl ++ movi ++
      chunk("idx1", idx.toByteArray)
    out.write(fcc("RIFF")); out.write(u32le(riffPayload.length.toLong))
    out.write(riffPayload)
    out.toByteArray
  }

  private def readU32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fccAt(b: Array[Byte], p: Int, s: String): Boolean =
    p + 4 <= b.length && b(p) == s.charAt(0).toByte &&
      b(p + 1) == s.charAt(1).toByte && b(p + 2) == s.charAt(2).toByte &&
      b(p + 3) == s.charAt(3).toByte

  /** Demux an AVI: verify RIFF/'AVI ', walk the top-level chunk tree to
    * LIST('movi'), collect '00dc'/'00db' payloads in stream order.
    * Malformed sizes (overrunning the buffer) end the walk instead of
    * throwing — the mixed-corpus contract. Non-AVI bytes → Nil.
    */
  def demuxAvi(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null || bytes.length < 12 || !fccAt(bytes, 0, "RIFF") ||
      !fccAt(bytes, 8, "AVI ")) return Nil
    val frames = Seq.newBuilder[Array[Byte]]
    var p = 12
    while (p + 8 <= bytes.length) {
      val sz = readU32le(bytes, p + 4)
      val end = p + 8 + sz
      if (sz < 0 || end > bytes.length) return frames.result()
      if (fccAt(bytes, p, "LIST") && fccAt(bytes, p + 8, "movi")) {
        var q = p + 12
        while (q + 8 <= end) {
          val fsz = readU32le(bytes, q + 4)
          val fend = q + 8 + fsz
          if (fsz < 0 || fend > end) return frames.result()
          if (fccAt(bytes, q, "00dc") || fccAt(bytes, q, "00db"))
            frames += java.util.Arrays.copyOfRange(bytes, q + 8, fend.toInt)
          q = (fend + (fsz & 1)).toInt
        }
      }
      p = (end + (sz & 1)).toInt
    }
    frames.result()
  }

  /** Per-frame JPEG bytes of the 8×4 md5-fingerprint grayscale at
    * explicit quality 1.0 — the [[jpegRoundTrip]] encoder.
    */
  private def jpegOf(hex: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < 32) {
      img.getRaster.setSample(i % 8, i / 8, 0, hex.charAt(i).toInt & 0xff)
      i += 1
    }
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  /** Full real video path per row: two 8×4 grayscale frames (pixels =
    * ASCII of `md5(text)` / `md5(md5(text))`), JPEG-encoded, muxed into
    * an AVI, DEMUXED back via the RIFF walk, and decoded frame-by-frame
    * through ImageIO. Emits the [[jpegRoundTrip]] bounded-loss
    * certificate per frame: `(id, frame_id, decoded, width, height,
    * n_pixels, src_sum, sum_err, max_pix_err)` — geometry and `src_sum`
    * exact, decode error codec-dependent (queries gate it to booleans).
    */
  def aviRoundTrip(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_id", LongType),
      StructField("decoded", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("src_sum", LongType),
      StructField("sum_err", LongType),
      StructField("max_pix_err", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    val h0 = md5(to_binary(col(textCol), lit("utf-8")))
    df.select(col(idCol).cast(LongType).as("id"), h0.as("hex0"),
      md5(to_binary(h0, lit("utf-8"))).as("hex1"))
      .mapPartitions { rows =>
        imageIoNoCache
        rows.flatMap { r =>
          val id = r.getLong(0)
          val hexes = Seq(r.getString(1), r.getString(2))
          val avi = muxAvi(hexes.map(jpegOf), width = 8, height = 4)
          val frames = demuxAvi(avi)
          frames.zipWithIndex.map { case (fb, fi) =>
            val src = hexes(fi)
            var srcSum = 0L
            var i = 0
            while (i < 32) { srcSum += (src.charAt(i).toInt & 0xff); i += 1 }
            val dec =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(fb))
              catch { case scala.util.control.NonFatal(_) => null }
            if (dec != null && dec.getWidth == 8 && dec.getHeight == 4) {
              var (decSum, maxErr) = (0L, 0L)
              var j = 0
              while (j < 32) {
                val v = dec.getRaster.getSample(j % 8, j / 8, 0)
                decSum += v
                val e = math.abs(v - (src.charAt(j).toInt & 0xff)).toLong
                if (e > maxErr) maxErr = e
                j += 1
              }
              Row(id, fi.toLong, true, 8, 4, 32L, srcSum,
                math.abs(decSum - srcSum), maxErr)
            } else {
              Row(id, fi.toLong, false, 0, 0, 0L, srcSum, -1L, -1L)
            }
          }
        }
      }(enc)
      .toDF("id", "frame_id", "decoded", "width", "height", "n_pixels",
        "src_sum", "sum_err", "max_pix_err")
  }

  /** REAL AUDIO CODEC ======================================================
    * `javax.sound.sampled` also ships in the JVM: the audio modality gets
    * the same treatment as the image one. [[fingerprintWav]] manufactures
    * a REAL RIFF/WAVE file per document (16-bit PCM mono samples = the
    * ASCII codes of the md5 hex) through `AudioSystem.write`, and
    * [[audioSampleStats]] parses media back through
    * `AudioSystem.getAudioInputStream` — format from the actual header,
    * samples from the actual PCM frames. PCM is lossless, so the decoded
    * sample values must equal the md5 character codes and the round-trip
    * is oracle-checked (`q_multimodal_audio`), like the PNG path.
    */

  /** Manufacture a real WAV per row: 32 16-bit PCM mono samples at 8 kHz
    * — the ASCII codes of `md5(textCol)`'s hex chars — encoded through
    * `AudioSystem.write`. Output: (id, media, media_meta).
    */
  def fingerprintWav(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    fingerprintWavHex(
      df.select(col(idCol),
        md5(to_binary(col(textCol), lit("utf-8"))).as("__hex")),
      idCol, "__hex")

  /** [[fingerprintWav]] from a caller-supplied 32-hex-char column — the
    * audio counterpart of [[fingerprintImageHex]], so a query can plant
    * PERTURBED near-duplicate clips whose samples stay md5-derivable in
    * SQL (`q_audio_dedup`).
    */
  def fingerprintWavHex(df: DataFrame, idCol: String,
      hexCol: String): DataFrame = {
    val wav = udf { (hex: String) =>
      val pcm = new Array[Byte](64)
      var i = 0
      while (i < 32) {
        val v = hex.charAt(i).toInt // 16-bit little-endian, values < 128
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 32L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    df.select(col(idCol).as("id"), wav(col(hexCol)).as("media"))
      .select(col("id"), col("media"),
        struct(lit("audio/wav").as("mime"),
          length(col("media")).cast(LongType).as("n_bytes"),
          md5(col("media")).as("digest")).as("media_meta"))
  }

  /** Parse `media` as an audio file via `AudioSystem` and emit per-clip
    * sample statistics: `(id, decoded, sample_rate, channels, n_samples,
    * sum_sample, min_sample, max_sample)`. Signed 16-bit little-endian
    * PCM is decoded to exact sample values; bytes that are not a
    * parseable audio file fall back to the raw-byte stub
    * (`decoded = false`), mirroring [[imagePixelStats]].
    */
  def audioSampleStats(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("decoded", BooleanType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_sample", LongType),
      StructField("min_sample", LongType),
      StructField("max_sample", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // [[decodePcm16le]]: non-16-bit-LE layouts convert through
          // the JDK before the sample loop (r15; the loop would pair
          // foreign bytes into garbage stats labeled decoded=true)
          val parsed = decodePcm16le(bytes)
          parsed match {
            case Some((fmt, data)) =>
              // data is signed 16-bit little-endian PCM (native or
              // JDK-converted above); fmt reports the ORIGINAL header
              var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
              val n = data.length / 2
              var i = 0
              while (i < n) {
                val v = ((data(2 * i) & 0xff) |
                  (data(2 * i + 1).toInt << 8)).toShort.toLong
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                i += 1
              }
              if (n == 0) { mn = 0L; mx = 0L }
              Row(id, true, fmt.getSampleRate.toInt, fmt.getChannels,
                n.toLong, sum, mn, mx)
            case None =>
              var (sum, mn, mx) = (0L, 255L, 0L)
              var i = 0
              while (i < bytes.length) {
                val v = (bytes(i) & 0xff).toLong
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                i += 1
              }
              Row(id, false, 0, 0, bytes.length.toLong, sum,
                if (bytes.isEmpty) 0L else mn, mx)
          }
        }
      }(enc)
      .toDF("id", "decoded", "sample_rate", "channels", "n_samples",
        "sum_sample", "min_sample", "max_sample")
  }

  /** Windowed energy features over decoded PCM — the audio
    * feature-extract stage (RMS energy per frame window is the classic
    * first feature of any audio pipeline): parse `media` through
    * `AudioSystem`, split samples into fixed windows of `windowSamples`,
    * emit per window the exact integer `sum_sq` (Σ v², the un-rooted
    * RMS numerator), `peak` (max |v|) and sample count — all BIGINTs, so
    * the whole decode→window→feature path oracle-checks bitwise
    * (`q_multimodal_energy`). 1 row in → ⌈n/window⌉ rows out, the same
    * explode shape as [[frameSample]]. Non-audio bytes emit nothing
    * (the gate is [[audioSampleStats]]'s `decoded` flag).
    */
  /** Decode audio bytes to SIGNED 16-BIT LITTLE-ENDIAN PCM via the JDK:
    * streams already in that layout pass through; any other decodable
    * layout (8-bit, mu-law/A-law, big-endian) converts through
    * `AudioSystem.getAudioInputStream(targetFormat, …)` so downstream
    * sample loops never pair foreign bytes into garbage (the r14-advice
    * fix, shared by [[audioSampleStats]], [[audioEnergyWindows]] and
    * [[ImageDedup.wavDeltaSketches]]). Returns the ORIGINAL header
    * format beside the converted frames; None when the bytes are not
    * decodable-or-convertible audio (the mixed-corpus fallback
    * contract). NonFatal-catching: JDK decoders throw
    * RuntimeExceptions, not just IOException, on malformed headers.
    */
  private[operators] def decodePcm16le(
      bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] =
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = raw.getFormat
      val isPcm16le =
        fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian
      val ais =
        if (isPcm16le) raw
        else javax.sound.sampled.AudioSystem.getAudioInputStream(
          new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            2 * fmt.getChannels, fmt.getSampleRate, false), raw)
      Some((fmt, ais.readAllBytes()))
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  def audioEnergyWindows(df: DataFrame,
      windowSamples: Int = 8): DataFrame = {
    require(windowSamples > 0, s"windowSamples must be positive")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("window_id", LongType),
      StructField("n_samples", LongType),
      StructField("sum_sq", LongType),
      StructField("peak", LongType)))
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val data = decodePcm16le(bytes).map(_._2)
          data.toSeq.flatMap { d =>
            val n = d.length / 2
            (0 until (n + windowSamples - 1) / windowSamples).map { w =>
              val lo = w * windowSamples
              val hi = math.min(lo + windowSamples, n)
              var (sq, pk) = (0L, 0L)
              var i = lo
              while (i < hi) {
                val v = ((d(2 * i) & 0xff) |
                  (d(2 * i + 1).toInt << 8)).toShort.toLong
                sq += v * v; val a = math.abs(v); if (a > pk) pk = a
                i += 1
              }
              Row(id, w.toLong, (hi - lo).toLong, sq, pk)
            }
          }
        }
      }(enc)
      .toDF("id", "window_id", "n_samples", "sum_sq", "peak")
  }

  /** Feature extraction over mixed media — every modality decodes for
    * REAL: AVI bytes (RIFF magic) demux through [[demuxAvi]] and every
    * frame decodes through ImageIO; image bytes (JPEG/PNG/GIF/BMP)
    * decode directly. Both produce a `dim`-bin LUMINANCE histogram over
    * all decoded pixels (ITU-R 601 integer weights), L1-normalized — a
    * genuine content feature. Only bytes NO codec accepts (exotic
    * formats, corrupt blobs) fall back to the labeled deterministic
    * stand-in: a `dim`-bin BYTE histogram — never crash the partition on
    * a mixed corpus. Batch shape (Iterator[Row] → Iterator[Row] inside
    * mapPartitions, one JVM-local pass per partition, no per-row
    * serialization churn) is shared by all paths.
    */
  def decodeAndFeaturize(df: DataFrame, dim: Int = 16): DataFrame = {
    val schema = featureSchema(dim)
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        imageIoNoCache
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val hist = new Array[Float](dim)
          var pixels = 0L
          def accumulate(img: java.awt.image.BufferedImage): Unit = {
            val (w, h) = (img.getWidth, img.getHeight)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (299 * ((rgb >> 16) & 0xff) +
                  587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
                hist(lum * dim / 256) += 1f
                x += 1
              }
              y += 1
            }
            pixels += w.toLong * h
          }
          def tryDecode(b: Array[Byte]): java.awt.image.BufferedImage =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
            catch { case scala.util.control.NonFatal(_) => null }
          val aviFrames = demuxAvi(bytes)
          if (aviFrames.nonEmpty) {
            // REAL video path: every demuxed frame decodes through the
            // JPEG codec; histogram spans all frames' pixels
            aviFrames.foreach { fb =>
              val img = tryDecode(fb)
              if (img != null) accumulate(img)
            }
          } else {
            val img = tryDecode(bytes)
            if (img != null) accumulate(img)
          }
          if (pixels > 0L) {
            var j = 0
            while (j < dim) { hist(j) /= pixels.toFloat; j += 1 }
          } else {
            // --- fallback for bytes no codec accepts: a byte histogram —
            // deterministic, same shape, honestly labeled ---
            var i = 0
            while (i < bytes.length) {
              hist((bytes(i) & 0xff) % dim) += 1f
              i += 1
            }
            val total = math.max(bytes.length, 1).toFloat
            var j = 0
            while (j < dim) { hist(j) /= total; j += 1 }
          }
          Row(id, hist.toSeq)
        }
      }(enc)
      .toDF("id", "features")
  }
}
