package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages (north star in BASELINE.json).
  *
  * The actual media codecs are NOT in this container, so the byte→pixels /
  * byte→samples step is a clearly marked deterministic STUB. Everything
  * around it — schema, batch shape, partition-parallel `mapPartitions`
  * stage, chunk explosion, feature vector schema — is the real plumbing a
  * decoder would drop into.
  */
object Multimodal {

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
      textCol: String): DataFrame = {
    val png = udf { (hex: String) =>
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
    df.select(col(idCol).as("id"),
      png(md5(to_binary(col(textCol), lit("utf-8")))).as("media"))
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
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
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

  /** STUB DECODER ===========================================================
    * A real implementation decodes `media` with an image/audio library and
    * emits a feature vector per row. The container has no codecs, so this
    * produces a deterministic fake: a `dim`-bin byte histogram, L1
    * normalized. Batch shape (Iterator[Row] → Iterator[Row] inside
    * mapPartitions, i.e. one JVM-local pass per partition, no
    * serialization churn per row) is exactly what the real decoder needs.
    */
  def decodeAndFeaturize(df: DataFrame, dim: Int = 16): DataFrame = {
    val schema = featureSchema(dim)
    val enc = RowEncoder.encoderFor(schema)
    df.select(col("id").cast(LongType), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          // --- STUB: replace from here with the real codec ---
          val hist = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) % dim) += 1f
            i += 1
          }
          val total = math.max(bytes.length, 1).toFloat
          var j = 0
          while (j < dim) { hist(j) /= total; j += 1 }
          // --- end STUB ---
          Row(id, hist.toSeq)
        }
      }(enc)
      .toDF("id", "features")
  }
}
