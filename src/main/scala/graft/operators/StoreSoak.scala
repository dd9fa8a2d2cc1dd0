package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the r15 APPEND lifecycles ([[FamilyStore]] /
  * [[SuffixStore]]): measures what the segmented stores buy over the
  * whole-corpus rerun a store-less pipeline pays per day, and
  * re-asserts the parity contract at tier scale (probe-after-append ≡
  * one-shot over the concatenated corpus) so the soak is a correctness
  * run, not only a stopwatch — the FamilySoak discipline applied to
  * the ingest loop.
  *
  * Split: bootstrap = doc_id % 10 ∉ {0, 9}, appended batch = % 10 = 9,
  * probe batch = % 10 = 0 (the `q_family_append` / `q_suffix_append`
  * gate shape). Timings:
  *   - `init_sec` — one-time store bootstrap (index + labels / index);
  *   - `append_sec` — processBatch: probe + eager materialize + segment
  *     append (the per-day price WITH the store);
  *   - `probe_sec` — read-only probe of the second batch against the
  *     two-segment store (the steady-state per-day price);
  *   - `rerun_sec` — the store-less baseline: whole-corpus families
  *     (suffixFamilies) / spans (duplicatedSpans) over ALL docs.
  *
  * A half-size bootstrap probed with the SAME batch isolates the
  * corpus-size dependence of one probe (`probe_half_sec` vs
  * `probe_sec` — the FamilySoak tier design at store grain: a ratio
  * ≈ 1 is the "probe never pays the corpus price" claim, measured
  * without conflating batch growth with corpus growth).
  *
  * Usage: `runMain graft.operators.StoreSoak <sfDir> [minLen]`
  * Prints one JSON line per store:
  * `{"store":"family"|"suffix","docs":N,"batch":N,"init_sec":…,
  *   "append_sec":…,"probe_sec":…,"probe_half_sec":…,"rerun_sec":…,
  *   "probe_rows":N,"parity":bool}`.
  */
object StoreSoak {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val minLen = if (args.length > 1) args(1).toInt else 25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0 &&
      col("doc_id") % 10 =!= 9).localCheckpoint(true)
    val b1 = docs.filter(col("doc_id") % 10 === 9).localCheckpoint(true)
    val b2 = docs.filter(col("doc_id") % 10 === 0).localCheckpoint(true)
    val nDocs = docs.count()
    val nBatch = b2.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val scratch = java.nio.file.Files
      .createTempDirectory("storesoak").toString

    // half-size bootstrap with the SAME probe batch — isolates the
    // corpus-size dependence of one probe (the FamilySoak tier design,
    // here at store grain: flat probe_half/probe_full ≈ 1 is the
    // "probe never pays the corpus price" claim)
    val corpusHalf = corpus.filter(col("doc_id") % 2 === 1)
      .localCheckpoint(true)

    // ---- family store ----
    locally {
      val (idxP, lblP) = (s"$scratch/fam/idx", s"$scratch/fam/lbl")
      val (idxH, lblH) = (s"$scratch/famh/idx", s"$scratch/famh/lbl")
      FamilyStore.init(corpusHalf, "doc_id", "text", idxH, lblH, minLen)
      val (_, probeHalfSec) = timed {
        FamilyStore.probe(b2, "doc_id", "text", idxH, lblH, minLen)
          .count()
      }
      val (_, initSec) = timed {
        FamilyStore.init(corpus, "doc_id", "text", idxP, lblP, minLen)
      }
      val (_, appendSec) = timed {
        FamilyStore.processBatch(b1, 0L, "doc_id", "text", idxP, lblP,
          minLen).count()
      }
      val ((probeRows, probe), probeSec) = timed {
        val p = FamilyStore.probe(b2, "doc_id", "text", idxP, lblP,
          minLen).localCheckpoint(true)
        (p.count(), p)
      }
      val ((parity, _), rerunSec) = timed {
        val fams = SuffixDedup.suffixFamilies(docs, "doc_id", "text",
          minLen).withColumnRenamed("id", "doc_id")
        val want = b2.select(col("doc_id"))
          .join(fams, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("label"), col("doc_id")).as("family"))
        (want.exceptAll(probe).isEmpty &&
          probe.exceptAll(want).isEmpty, ())
      }
      println(s"""{"store":"family","docs":$nDocs,"batch":$nBatch,""" +
        s""""init_sec":$initSec,"append_sec":$appendSec,""" +
        s""""probe_sec":$probeSec,"probe_half_sec":$probeHalfSec,""" +
        s""""rerun_sec":$rerunSec,""" +
        s""""probe_rows":$probeRows,"parity":$parity}""")
    }

    // ---- suffix (span-grain) store ----
    locally {
      val idxP = s"$scratch/sfx/idx"
      val idxH = s"$scratch/sfxh/idx"
      SuffixStore.init(corpusHalf, "doc_id", "text", idxH, minLen)
      val (_, probeHalfSec) = timed {
        SuffixStore.probe(b2, "doc_id", "text", idxH, minLen).count()
      }
      val (_, initSec) = timed {
        SuffixStore.init(corpus, "doc_id", "text", idxP, minLen)
      }
      val (_, appendSec) = timed {
        SuffixStore.processBatch(b1, 0L, "doc_id", "text", idxP,
          minLen).count()
      }
      val ((probeRows, probe), probeSec) = timed {
        val p = SuffixStore.probe(b2, "doc_id", "text", idxP, minLen)
          .localCheckpoint(true)
        (p.count(), p)
      }
      val ((parity, _), rerunSec) = timed {
        val want = SuffixDedup.duplicatedSpans(docs, "doc_id", "text",
          minLen).filter(col("doc_id") % 10 === 0)
        (want.exceptAll(probe).isEmpty &&
          probe.exceptAll(want).isEmpty, ())
      }
      println(s"""{"store":"suffix","docs":$nDocs,"batch":$nBatch,""" +
        s""""init_sec":$initSec,"append_sec":$appendSec,""" +
        s""""probe_sec":$probeSec,"probe_half_sec":$probeHalfSec,""" +
        s""""rerun_sec":$rerunSec,""" +
        s""""probe_rows":$probeRows,"parity":$parity}""")
    }
  }
}
