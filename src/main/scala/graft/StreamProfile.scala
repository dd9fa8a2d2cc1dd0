package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Diagnostic main (not a graded surface): run named registry queries
  * with a session-wide [[StreamingQueryListener]] and print every
  * micro-batch's `durationMs` breakdown (triggerExecution and its
  * phases: addBatch, getBatch, latestOffset, queryPlanning, walCommit,
  * commitOffsets) — the §1 "measure first" tool for the streaming
  * gates' fixed per-batch latency (r17 verdict #4: ~50 s of the suite
  * is `processAllAvailable` overhead that ANTI-scales with local
  * cores; this decomposes where each batch's milliseconds go).
  *
  *   sbt "runMain graft.StreamProfile <sfDir> <query>[,<query>...]"
  *
  * Progress events are async (best-effort drain, same caveat as
  * QueryProfile); each query runs once warm then once measured.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        progress.add(e.progress); ()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = run()
      progress.clear()
      spark.streams.addListener(listener)
      val t = run()
      spark.streams.removeListener(listener)
      Thread.sleep(500) // best-effort async drain
      val ps = new scala.collection.mutable.ArrayBuffer[
        org.apache.spark.sql.streaming.StreamingQueryProgress]()
      progress.forEach(p => { ps += p; () })
      println(f"== $name warm=$warm%.2fs measured=$t%.2fs " +
        f"batches=${ps.size} (progress list best-effort)")
      val keys = ps.flatMap(_.durationMs.keySet.toArray
        .map(_.toString)).distinct.sorted
      ps.foreach { p =>
        val d = keys.map { k =>
          val v = Option(p.durationMs.get(k)).map(_.toString).getOrElse("-")
          s"$k=$v"
        }.mkString(" ")
        println(f"   batch ${p.batchId}%3d rows=${p.numInputRows}%5d $d")
        p.stateOperators.foreach { so =>
          println(f"      state ${so.operatorName} upd=${so.allUpdatesTimeMs}" +
            f"ms rm=${so.allRemovalsTimeMs}ms commit=${so.commitTimeMs}ms " +
            f"rows=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
        }
      }
      // per-phase totals across batches
      val totals = keys.map { k =>
        k -> ps.flatMap(p => Option(p.durationMs.get(k)).map(_.longValue))
          .sum
      }
      println("   TOTALS " +
        totals.map { case (k, v) => s"$k=${v}ms" }.mkString(" "))
    }
    spark.stop()
  }
}
