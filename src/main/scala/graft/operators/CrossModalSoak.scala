package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dense-tier soak for the cross-modal curation composition (r15
  * verdict #7: `q_corpus_prep_multimodal` gates the composed pipeline
  * at a 200-doc oracle slice; this main runs the SAME implementation —
  * [[CrossModal.plantedEntities]] + [[CrossModal.prepAttrition]] — at
  * the MediaSoak tier and publishes stage-attrition and wall rows).
  * The planted construction scales its cross-modal merges with the
  * corpus (one class-3 A/B/C construct per 4 docs), so the dense tier
  * carries thousands of clusters that fall ONLY at the merge stage —
  * non-trivial cross-modal attrition at soak scale, not a census of
  * zeros.
  *
  * Usage: `runMain graft.operators.CrossModalSoak <sfDir> [nDocsBase]
  * [cap]` — base tier = `nDocsBase` docs (2× entities), dense tier =
  * 10× that (the MediaSoak convention; one JVM per run, compare ratios
  * within a run). Prints one JSON line per tier:
  * `{"tier":…,"entities":N,"wall_sec":…,"stages":[{"stage":…,
  * "n_in":…,"n_kept":…,"n_dropped":…},…]}` and a final
  * `{"metric":"crossmodal_soak",…}` line with the rows/wall ratios.
  */
object CrossModalSoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nDocsBase = if (args.length > 1) args(1).toInt else 2000
    val cap = if (args.length > 2) args(2).toInt else 1000
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
      // first nDocs by id, the MediaSoak convention: replica fixtures
      // assign replica ids far above the original range, so an
      // id-threshold tier would silently stop growing past the originals
      val tier = docs.orderBy(col("doc_id")).limit(nDocs)
        .select(col("doc_id"), col("text"))
      val ents = CrossModal.plantedEntities(tier)
        .localCheckpoint(true) // fixture manufactured once; the soak
                               // times the three channels + merge
      val nEnts = ents.count()
      val (stages, wallSec) = timed {
        CrossModal.prepAttrition(ents, maxBucketSize = cap)
          .orderBy("stage_id")
          .select(col("stage"), col("n_in"), col("n_kept"),
            col("n_dropped"))
          .collect()
      }
      val stageJson = stages.map(r =>
        s"""{"stage":"${r.getString(0)}","n_in":${r.getLong(1)},""" +
          s""""n_kept":${r.getLong(2)},"n_dropped":${r.getLong(3)}}""")
        .mkString("[", ",", "]")
      println(s"""{"tier":"$tag","entities":$nEnts,""" +
        s""""wall_sec":$wallSec,"stages":$stageJson}""")
      (nEnts, wallSec)
    }

    val (baseEnts, baseSec) = runTier("base", nDocsBase)
    val (denseEnts, denseSec) = runTier("dense", nDocsBase * 10)
    val rowsRatio = denseEnts.toDouble / baseEnts
    val wallRatio = denseSec / baseSec
    println(s"""{"metric":"crossmodal_soak","base_entities":$baseEnts,""" +
      s""""dense_entities":$denseEnts,"wall_ratio":$wallRatio,""" +
      s""""rows_ratio":$rowsRatio}""")
  }
}
