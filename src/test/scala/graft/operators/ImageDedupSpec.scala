package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted corpus: 40 base images from md5-hex fingerprints, each with
    * a near-identical variant (one hex position rewritten → ≤ 2 aHash
    * bit flips under the letter/digit threshold), plus the variant ids
    * offset so pair identity is checkable.
    */
  private def planted = {
    val base = (0L until 40L).map(i => (i, s"document number $i payload"))
      .toDF("id", "text")
      .select(col("id"), md5(to_binary(col("text"), lit("utf-8"))).as("hex"))
    base.select(col("id") * 2, col("hex")).toDF("id", "hex")
      .unionAll(base.select(col("id") * 2 + 1,
        concat(lit("0"), expr("substring(hex, 2)"))).toDF("id", "hex"))
  }

  private def plantedMedia =
    Multimodal.fingerprintImageHex(planted, "id", "hex")

  test("banding is lossless at the hamming bound: banded == brute force") {
    val banded = ImageDedup.nearDupPairs(plantedMedia, hammingMax = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val brute = ImageDedup.bruteForcePairs(plantedMedia, hammingMax = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(banded == brute)
    assert(banded.nonEmpty)
  }

  test("planted perturbations are recalled as near-dups") {
    val pairs = ImageDedup.nearDupPairs(plantedMedia, hammingMax = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every (2i, 2i+1) plant whose rewritten hex position had the same
    // letter/digit class flips 0 bits; a class change flips exactly 2
    // (the thumbnail duplicates each source row) — both within bound 3
    val expected = (0L until 40L).map(i => (i * 2, i * 2 + 1)).toSet
    assert(expected.subsetOf(pairs))
  }

  test("resize composes: an image and its re-encoded resize pair at hamming 0") {
    // nearest-neighbor 8x4 -> 8x8 upsample re-encoded through the real
    // codec has the SAME 8x8 thumbnail as the original (the thumbnail of
    // an 8x8 image is the identity), so the pair must verify at 0
    val one = Multimodal.fingerprintImageHex(
      planted.filter(col("id") === 0L), "id", "hex")
    val resized = Multimodal.resizeImages(one, dstW = 8, dstH = 8)
      .select((col("id") + 1000L).as("id"), col("media"))
    val pairs = ImageDedup.nearDupPairs(
      one.select("id", "media").unionAll(resized), hammingMax = 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSeq == Seq((0L, 1000L, 0)))
  }

  test("dHash sketches: identical images collide, unrelated ones do not pair") {
    val pairs = ImageDedup.nearDupPairs(plantedMedia, hammingMax = 0,
      sketcher = ImageDedup.dHashSketches)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // hamming 0 under dHash: at minimum nothing false-fires between
    // unrelated docs' fingerprints beyond chance; check the planted
    // exact-duplicate case explicitly
    val dup = Multimodal.fingerprintImageHex(
      planted.filter(col("id") < 2), "id", "hex")
    val exact = ImageDedup.nearDupPairs(
      dup.select(col("id"), col("media"))
        .unionAll(dup.select(col("id") + 100L, col("media"))),
      hammingMax = 0, sketcher = ImageDedup.dHashSketches)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((0L, 100L)) && exact.contains((1L, 101L)))
    assert(!pairs.contains((0L, 2L)))
  }

  test("non-decodable bytes take the labeled fallback, do not crash") {
    val junk = Seq((1L, Array[Byte](1, 2, 3, 4)),
      (2L, Array[Byte](1, 2, 3, 4))).toDF("id", "media")
    val sk = ImageDedup.aHashSketches(junk)
      .select("id", "decoded", "sketch").as[(Long, Boolean, Long)]
      .collect().sortBy(_._1)
    assert(sk.forall(!_._2))
    assert(sk(0)._3 == sk(1)._3) // deterministic fallback sketch
    val empty = ImageDedup.aHashSketches(
      Seq((3L, Array.empty[Byte])).toDF("id", "media")).collect()
    assert(empty.length == 1)
  }

  test("bruteForcePairs refuses corpus-sized input") {
    val big = spark.range(0, 200000)
      .select(col("id"), lit(Array[Byte](1, 2, 3)).as("media"))
    val e = intercept[IllegalArgumentException] {
      ImageDedup.bruteForcePairs(big, maxDocs = 100000).count()
    }
    assert(e.getMessage.contains("maxDocs"))
  }

  test("audio near-dup: banded == brute force, planted clips recalled, " +
      "junk bytes take the labeled fallback") {
    val media = Multimodal.fingerprintWavHex(planted, "id", "hex")
    val banded = ImageDedup.nearDupPairs(media, hammingMax = 3,
      sketcher = ImageDedup.wavDeltaSketches)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val brute = ImageDedup.bruteForcePairs(media, hammingMax = 3,
      sketcher = ImageDedup.wavDeltaSketches)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    assert(banded == brute)
    // the rewritten hex position is sample 0, which only anchors
    // j ∈ {0,1,2} read; bits 0-1 compare equal anchors (always 0), so a
    // plant flips AT MOST bit 2 — every (2i, 2i+1) pair is in bound
    val ids = banded.map(p => (p._1, p._2))
    for (i <- 0L until 40L)
      assert(ids.contains((i * 2, i * 2 + 1)), s"missing plant $i")
    assert(banded.forall { case (a, b, h) =>
      a % 2 == 0 && b == a + 1 && h <= 1 || h <= 3 })
    val junk = ImageDedup.wavDeltaSketches(
      Seq((1L, Array[Byte](9, 9, 9))).toDF("id", "media"))
      .select("decoded").as[Boolean].collect()
    assert(junk.toSeq == Seq(false))
  }

  test("video frame near-dup pairs planted perturbed videos per frame") {
    val docs = Seq((0L, "video text alpha"), (1L, "video text beta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        md5(to_binary(col("text"), lit("utf-8"))).as("h0"))
      .withColumn("h1", md5(to_binary(col("h0"), lit("utf-8"))))
    val hexes = docs.select((col("doc_id") * 2).as("id"), col("h0"), col("h1"))
      .unionAll(docs.select((col("doc_id") * 2 + 1).as("id"),
        concat(lit("0"), expr("substring(h0, 2)")).as("h0"),
        concat(lit("0"), expr("substring(h1, 2)")).as("h1")))
    val vids = Multimodal.fingerprintVideoHex(hexes, "id", "h0", "h1")
    val pairs = ImageDedup.videoFrameNearDupPairs(vids, hammingMax = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // original video v=2d, perturbed v=2d+1; frame ids v*1000 + {0, 1}:
    // each original frame pairs with the SAME frame of the perturbation
    for (d <- 0L to 1L; f <- 0L to 1L)
      assert(pairs.contains((d * 2000 + f, (d * 2 + 1) * 1000 + f)),
        s"missing planted pair for doc $d frame $f in $pairs")
  }

  test("video ids outside the packable range are refused, not collided") {
    val vids = Seq((-1L, Array[Byte](0, 1, 2))).toDF("id", "media")
    val e = intercept[org.apache.spark.SparkException] {
      ImageDedup.videoFrameNearDupPairs(vids).count()
    }
    assert(e.getMessage.contains("packable range") ||
      Option(e.getCause).exists(_.getMessage.contains("packable range")))
  }

  /** In-memory WAV in an arbitrary encoding: the SAME 40-sample ramp
    * waveform written as 16-bit LE signed (the engine's native layout),
    * 8-bit unsigned, and 16-bit BIG-endian PCM.
    */
  private def wavBytes(fmt: javax.sound.sampled.AudioFormat,
      data: Array[Byte]): Array[Byte] = {
    val frames = data.length / fmt.getFrameSize
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("non-16-bit-LE WAV layouts convert before sketching instead of " +
      "pairing bytes into garbage: 8-bit and big-endian sketches equal " +
      "the 16-bit-LE sketch of the same waveform") {
    import javax.sound.sampled.AudioFormat
    import javax.sound.sampled.AudioFormat.Encoding.{PCM_SIGNED, PCM_UNSIGNED}
    // a non-monotone waveform so the delta-hash has mixed bits
    val wave = Array.tabulate(40)(i => ((i * 37) % 97 - 48).toByte)
    val le16 = wavBytes(new AudioFormat(PCM_SIGNED, 8000f, 16, 1, 2,
      8000f, false), wave.flatMap(v => Array[Byte](0, v)))
    val u8 = wavBytes(new AudioFormat(PCM_UNSIGNED, 8000f, 8, 1, 1,
      8000f, false), wave.map(v => (v + 128).toByte))
    val be16 = wavBytes(new AudioFormat(PCM_SIGNED, 8000f, 16, 1, 2,
      8000f, true), wave.flatMap(v => Array[Byte](v, 0)))
    val sk = ImageDedup.wavDeltaSketches(
      Seq((0L, le16), (1L, u8), (2L, be16)).toDF("id", "media"))
      .select("id", "decoded", "sketch").as[(Long, Boolean, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(sk.values.forall(_._1), s"all three layouts must decode: $sk")
    // conversion is monotone per sample (8-bit scales, BE swaps bytes),
    // so the temporal gradient SIGNS — the sketch bits — are identical
    assert(sk(1L)._2 == sk(0L)._2,
      s"8-bit sketch must match 16-bit-LE: $sk")
    assert(sk(2L)._2 == sk(0L)._2,
      s"big-endian sketch must match little-endian: $sk")
    assert(sk(0L)._2 != 0L, "the ramp must produce a non-trivial sketch")
  }
}
