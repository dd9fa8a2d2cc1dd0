package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints the formatted physical plan of the named
  * registry queries (all of them with no args). Usage:
  * {{{ sbt "runMain graft.ExplainTool q_dup_spans q_bloom_join" }}}
  * Reads `SPARK_GRAFT_SF_DIR` (default sf0.01) like Bench.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.ParseQueries.feedFixtureDir
    graft.queries.ParseQueries.companyMirrorDir
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
