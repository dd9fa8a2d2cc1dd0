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
