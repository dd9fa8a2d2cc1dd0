package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the ingest gate a 100 TB
  * pipeline runs before letting a batch into the corpus (the
  * Deequ/Great-Expectations role, expressed Spark-first): a rule set
  * is compiled into as few passes as the rule types allow and comes
  * back as one small report row per rule.
  *
  * Pass structure, not per-rule scans:
  *   - ALL row-local rules ([[Check.NotNull]], [[Check.InRange]],
  *     [[Check.Accepted]], [[Check.Satisfies]]) fold into ONE
  *     aggregation over the table — a conditional-sum per rule riding
  *     a single scan (map-side combined, no shuffle beyond the final
  *     1-row reduce).
  *   - each [[Check.Unique]] is one groupBy on its key columns
  *     (violations = Σ(count − 1) over duplicated keys).
  *   - each [[Check.ForeignKey]] is one left-anti join against the
  *     (broadcastable) dimension's key set.
  *
  * Every reported number is an exact BIGINT count, so the report is
  * engine-reproducible and the gate (`n_violations = 0`) is crisp.
  * Null semantics: InRange/Accepted/Satisfies count NULL as a
  * violation only if the predicate says so — they pair with a NotNull
  * rule rather than silently skipping nulls (the classic validation
  * blind spot); ForeignKey ignores null keys (NotNull owns those).
  *
  * Output: `(rule, target, n_rows, n_violations, pass)` ordered by
  * rule name — `n_rows` the checked population for that rule.
  */
object DataChecks {

  sealed trait Check { def name: String; def target: String }
  object Check {
    /** column must be non-null */
    final case class NotNull(col: String) extends Check {
      val name = "not_null"; def target: String = col
    }
    /** value in [lo, hi] (inclusive); nulls pass (NotNull owns them) */
    final case class InRange(col: String, lo: Double, hi: Double)
        extends Check {
      val name = "in_range"; def target: String = col
    }
    /** value in the accepted set; nulls pass */
    final case class Accepted(col: String, values: Seq[String])
        extends Check {
      val name = "accepted_values"; def target: String = col
    }
    /** arbitrary row predicate must hold (null predicate = violation) */
    final case class Satisfies(label: String, pred: Column) extends Check {
      val name = "satisfies"; def target: String = label
    }
    /** key columns identify at most one row */
    final case class Unique(cols: Seq[String]) extends Check {
      val name = "unique"; def target: String = cols.mkString(",")
    }
    /** every non-null value exists in the dimension key column */
    final case class ForeignKey(col: String, dim: DataFrame,
        dimCol: String) extends Check {
      val name = "foreign_key"; def target: String = col
    }
  }

  private def rowLocalViolation(c: Check): Option[Column] = c match {
    case Check.NotNull(col0) => Some(col(col0).isNull)
    case Check.InRange(col0, lo, hi) => Some(col(col0).isNotNull &&
      !(col(col0) >= lo && col(col0) <= hi))
    case Check.Accepted(col0, vs) => Some(col(col0).isNotNull &&
      !col(col0).isin(vs: _*))
    case Check.Satisfies(_, pred) => Some(!coalesce(pred, lit(false)))
    case _ => None
  }

  /** The report is a handful of rows, so each pass's 1-row aggregate is
    * collected and the report emitted as a local relation — re-deriving
    * it relationally would re-execute the shared aggregation once per
    * union branch (Spark does not dedupe identical aggregate subtrees
    * the way it reuses exchanges).
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    require(checks.map(c => (c.name, c.target)).distinct.size ==
      checks.size, "duplicate (rule, target) pairs in the check list")
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = checks.flatMap(c => rowLocalViolation(c).map(c -> _))
    val rowLocalRows: Seq[(String, String, Long, Long)] =
      if (rowLocal.isEmpty) Seq.empty
      else {
        val aggs = count(lit(1)).as("__n") +:
          rowLocal.zipWithIndex.map { case ((_, viol), i) =>
            coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L))
              .as(s"__v$i")
          }
        val r = df.agg(aggs.head, aggs.tail: _*).collect().head
        rowLocal.zipWithIndex.map { case ((c, _), i) =>
          (c.name, c.target, r.getLong(0), r.getLong(i + 1))
        }
      }
    val otherRows = checks.collect {
      case c @ Check.Unique(cols0) =>
        val r = df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")), lit(0L)),
            coalesce(sum(col("__c") - 1L), lit(0L)))
          .collect().head
        (c.name, c.target, r.getLong(0), r.getLong(1))
      case c @ Check.ForeignKey(col0, dim, dimCol) =>
        val keys = dim.select(col(dimCol).as(col0)).distinct()
        val nonNull = df.filter(col(col0).isNotNull).select(col(col0))
        // left join against the key set; an unmatched probe is an orphan
        val joined = nonNull.join(
            broadcast(keys.withColumn("__hit", lit(1))), Seq(col0), "left")
          .agg(count(lit(1)),
            coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)),
              lit(0L)))
          .collect().head
        (c.name, c.target, joined.getLong(0), joined.getLong(1))
    }
    (rowLocalRows ++ otherRows)
      .toDF("rule", "target", "n_rows", "n_violations")
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy(col("rule"), col("target"))
  }
}
