package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // testdata contract probe: the events timestamp physical type changed
    // silently mid-round once and broke 11 queries at analysis time —
    // print it up front so a regeneration is diagnosable in seconds.
    // Q.usCol adapts to LongType (NANOS via nanosAsLong) and Timestamp
    // (NTZ) (MICROS); anything else fails loudly there.
    System.err.println("[bench] events.ts type = " +
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType)
    // warm the session so timings reflect steady state rather than
    // first-query JVM/codegen warmup: scan + agg + join + window + noop
    // write compile the code paths the suite uses
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000)
      li.groupBy("l_returnflag").agg(sum("l_quantity"))
        .join(li.select("l_returnflag").distinct(), "l_returnflag")
        .withColumn("rn", row_number().over(
          Window.partitionBy("l_returnflag").orderBy("l_returnflag")))
        .write.format("noop").mode("overwrite").save()
    }
    // harness setup: materialize the feed-archive and company-mirror
    // fixtures outside the timing loop (the registry entries do no I/O)
    graft.queries.ParseQueries.feedFixtureDir
    graft.queries.ParseQueries.companyMirrorDir
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // deterministic name order: map-hash order would hand the codegen/JIT
    // warmup cost to a different query every run
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column — a bare
      // count() lets Catalyst prune unreferenced projections, which would
      // time scan+count instead of the operator under test
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // ANCHOR CALIBRATION (SOAK_r07): this host drifts 3-5× across days,
    // so cross-round query comparisons need a same-run host-speed
    // reference. Re-time five stable, code-frozen queries in a dedicated
    // pass AFTER the suite (steady state, position-independent) and emit
    // them in the JSON — consumers divide by the anchor ratio before
    // calling anything a regression.
    val anchorNames = Seq("q_join_agg", "q_lm_counts", "q_intersect",
      "q_heavy_hitters", "q_idx_parse")
    val anchors = anchorNames.flatMap { name =>
      SparkEntry.queries.get(name).flatMap { fn =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some(name -> (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // a failed query records err (not a near-zero timing passed off as
    // success) and is excluded from the total so timings stay comparable;
    // only failures appear in the map — an all-null map doubled the line
    // length and overflowed the driver's tail capture in round 3
    val errs = results.collect { case (k, _, Some(e)) =>
      jstr(k) + ":" + jstr(e)
    }.mkString("{", ",", "}")
    val nFailed = results.count(_._3.isDefined)
    val total = results.collect { case (_, v, None) => v }.sum
    val anchorJson = anchors.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":$nFailed,"anchors":$anchorJson,"sf":"$sfDir"}"""
    // stdout is the driver contract (one JSON line), but a capture buffer
    // can truncate it — persist the same JSON to a file so the record
    // survives regardless
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_OUT", "."), "bench_out.json")
    try java.nio.file.Files.write(outFile,
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"warn: could not write $outFile: $e") }
    println(json)
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
