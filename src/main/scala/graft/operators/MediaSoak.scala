package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Media-dense scale soak for the perceptual near-dup tier (r14 verdict
  * #5): the image/video/audio operators shipped in r14 gated only at
  * oracle scale (planted pairs, a few hundred media rows) — this soak
  * applies the SuffixSoak treatment to [[ImageDedup]]: a media-dense
  * corpus with replica clusters AND a universal-boilerplate cluster
  * (the "same logo on every page" shape) big enough to TRIP the band
  * bucket cap, at two tiers (base and ~10× rows), so the published
  * table shows (a) over-cap buckets > 0 with the census that sizes the
  * cap, (b) banding recall against brute force on the base tier, and
  * (c) a ≤ ~linear wall ratio in media rows — the claim that the
  * (band, key) exchange, not the decode, is the scaling term.
  *
  * Corpus construction (per tier, from `documents.parquet`): each of
  * `nDocs` docs contributes `nVariants` PNG images decoded from its
  * md5 hex with ONE hex position rewritten per variant (position
  * v % 32) — every variant pairs with the base image within the
  * hamming bound, replicating re-encoded/cropped asset families —
  * plus `logoEvery` docs contribute one image of the SHARED logo hex
  * (identical sketches → one giant bucket per band; with the logo
  * cluster larger than `cap` every one of its buckets must trip).
  *
  * Usage: `runMain graft.operators.MediaSoak <sfDir> [nDocs] [cap]`
  * Prints one JSON line per tier plus a summary ratio line:
  * `{"tier":…,"images":N,"buckets":N,"max_bucket":N,"capped_buckets":N,
  *   "pairs":N,"sketch_band_sec":…,"pairs_sec":…}` then
  * `{"metric":"media_soak","base_images":…,"dense_images":…,
  *   "wall_ratio":…,"rows_ratio":…,"recall_base":…}`.
  */
object MediaSoak {

  private val LogoHex = "0123456789abcdef0123456789abcdef"

  /** The tier's media frame: nDocs × nVariants perturbed variants plus
    * the shared-logo cluster (one per `logoEvery` docs).
    */
  private[operators] def mediaTier(docs: DataFrame, nDocs: Int,
      nVariants: Int, logoEvery: Int): DataFrame = {
    // first nDocs by id (not `doc_id < nDocs`): replica fixtures like
    // sf1_d90 assign replica ids far above the original range, and an
    // id-threshold tier would silently stop growing past the originals
    val base = docs.orderBy(col("doc_id")).limit(nDocs)
      .select(col("doc_id"),
        md5(to_binary(col("text"), lit("utf-8"))).as("hex"))
    val variants = base
      .select(col("doc_id"), col("hex"),
        explode(sequence(lit(0), lit(nVariants - 1))).as("v"))
      .select((col("doc_id") * (nVariants + 1) + col("v")).as("id"),
        // rewrite hex position (v % 32) to '0' — one pixel class flip
        concat(
          expr(s"substring(hex, 1, v % 32)"), lit("0"),
          expr(s"substring(hex, v % 32 + 2)")).as("hex"))
    val logos = base.filter(col("doc_id") % logoEvery === 0)
      .select((col("doc_id") * (nVariants + 1) + lit(nVariants)).as("id"),
        lit(LogoHex).as("hex"))
    Multimodal.fingerprintImageHex(variants.unionByName(logos), "id", "hex")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nDocsBase = if (args.length > 1) args(1).toInt else 2000
    // default cap BELOW the base tier's logo-cluster size (nDocsBase/4)
    // so the over-cap census is non-zero at BOTH tiers and the pair
    // counts stay comparable (an under-cap logo cluster at base would
    // explode into ~n²/2 pairs that the dense tier's capped cluster
    // never emits, poisoning the wall ratio)
    val cap = if (args.length > 2) args(2).toInt else 300
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def runTier(tag: String, nDocs: Int): (Long, Double) = {
      val media = mediaTier(docs, nDocs, nVariants = 4, logoEvery = 4)
        .localCheckpoint(true) // media manufactured once; the soak times
                               // sketch + band + pair, not the fixture
      val nImages = media.count()
      val (census, censusSec) = timed {
        ImageDedup.bucketStats(media, hammingMax = 3, maxBucketSize = cap)
          .head()
      }
      val (nPairs, pairsSec) = timed {
        ImageDedup.nearDupPairs(media, hammingMax = 3, maxBucketSize = cap)
          .localCheckpoint(true).count()
      }
      println(s"""{"tier":"$tag","images":$nImages,""" +
        s""""buckets":${census.getLong(0)},""" +
        s""""max_bucket":${census.getLong(1)},""" +
        s""""capped_buckets":${census.getLong(2)},""" +
        s""""pairs":$nPairs,"sketch_band_sec":$censusSec,""" +
        s""""pairs_sec":$pairsSec}""")
      (nImages, pairsSec)
    }

    // banding recall vs brute force on the base tier (the eval face
    // refuses corpus-sized input, so recall gates at base scale only)
    val baseMedia = mediaTier(docs, nDocsBase, 4, 4).localCheckpoint(true)
    val banded = ImageDedup.nearDupPairs(baseMedia, hammingMax = 3,
      maxBucketSize = cap).select("id_a", "id_b")
    val brute = ImageDedup.bruteForcePairs(baseMedia, hammingMax = 3,
      maxDocs = 200000).select("id_a", "id_b")
    // over-cap buckets DROP pairs by design; recall is measured against
    // brute force restricted to non-logo images (logo ids ≡ nVariants
    // mod (nVariants+1)) — the cap contract excludes the logo cluster
    val nonLogo = (c: org.apache.spark.sql.Column) => c % 5 =!= 4
    val bruteKept = brute.filter(nonLogo(col("id_a")) &&
      nonLogo(col("id_b"))).localCheckpoint(true)
    val hit = bruteKept.join(banded, Seq("id_a", "id_b"), "left_semi")
      .count()
    val expected = bruteKept.count()
    val recall = if (expected == 0) 1.0 else hit.toDouble / expected

    val (baseImages, baseSec) = runTier("base", nDocsBase)
    val (denseImages, denseSec) = runTier("dense", nDocsBase * 10)
    val rowsRatio = denseImages.toDouble / baseImages
    val wallRatio = denseSec / baseSec
    println(s"""{"metric":"media_soak","base_images":$baseImages,""" +
      s""""dense_images":$denseImages,"wall_ratio":$wallRatio,""" +
      s""""rows_ratio":$rowsRatio,"recall_base":$recall}""")
  }
}
