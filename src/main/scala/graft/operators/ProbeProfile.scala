package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: count the Spark jobs (and their walls) inside ONE
  * [[FamilyStore.probe]] — the fixed-phase floor the r15 verdict asked
  * to cut. Usage: `runMain graft.operators.ProbeProfile <sfDir>`.
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0 &&
      col("doc_id") % 10 =!= 9)
    val b1 = docs.filter(col("doc_id") % 10 === 9).localCheckpoint(true)
    val b2 = docs.filter(col("doc_id") % 10 === 0).localCheckpoint(true)
    val scratch = java.nio.file.Files
      .createTempDirectory("probeprof").toString
    val (idxP, lblP) = (s"$scratch/idx", s"$scratch/lbl")
    FamilyStore.init(corpus, "doc_id", "text", idxP, lblP, 25)
    FamilyStore.processBatch(b1, 0L, "doc_id", "text", idxP, lblP, 25)
    // warm probe (not measured) so JIT/codegen caches are hot
    FamilyStore.probe(b2, "doc_id", "text", idxP, lblP, 25).count()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("") + " | " +
          j.stageInfos.map(_.name.takeWhile(_ != '(')).mkString(",")
        starts.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (j.time, "?"))
        lines.add(f"job ${j.jobId}%4d ${(j.time - t0) / 1000.0}%7.3fs  $desc")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = FamilyStore.probe(b2, "doc_id", "text", idxP, lblP, 25)
      .count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    lines.asScala.foreach(println)
    println(s"TOTAL probe: ${lines.size()} jobs, ${wall}s, rows=$n")
  }
}
