package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the oracle-checked query registry.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *   - Monetary/measure doubles are ≤4-decimal by construction (TESTDATA),
  *     so sums go through DECIMAL(18,4) — exact, order-independent — and
  *     cast back to double only at the output edge. Both engines then emit
  *     bit-identical doubles.
  *   - Computed integers are cast to LongType (DuckDB counts/row_numbers
  *     are BIGINT).
  *   - Every query ends in a total ORDER BY (unique tiebreaker included).
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Epoch-microseconds (LongType) view of an event-time column, adaptive
    * to how the testdata generation wrote it:
    *   - TIMESTAMP(NANOS) parquet  → Spark reads long ns (via
    *     `spark.sql.legacy.parquet.nanosAsLong`) → `div 1000`;
    *   - TIMESTAMP(MICROS) parquet → TimestampType or TimestampNTZType →
    *     `unix_micros` (session timezone is UTC in Verify/Bench, so the
    *     NTZ wall-clock maps to the same instant DuckDB's `epoch_us` uses).
    * Every DuckDB oracle reads µs via `epoch_us(ts)`, so both generations
    * stay green without touching the oracle SQL.
    */
  def usCol(df: DataFrame, c: String = "ts"): Column =
    df.schema(c).dataType match {
      case LongType          => expr(s"$c div 1000")
      case TimestampNTZType  => unix_micros(col(c).cast(TimestampType))
      case TimestampType     => unix_micros(col(c))
      case dt => throw new IllegalStateException(
        s"events.$c has unexpected type $dt — testdata regenerated with a " +
          "new timestamp physical type? Extend Q.usCol for it.")
    }

  /** `events` with `ts` normalized to TimestampType (µs, UTC session),
    * whatever the parquet physical type (see [[usCol]]).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "events")
    df.withColumn("ts", timestamp_micros(usCol(df)))
  }

  /** Engine-portable parts-per-billion quantization of a double.
    *
    * `floor(x·1e9 + 0.5)` is a fixed IEEE op sequence (multiply, add,
    * floor) that every engine computes bit-identically; `round()` is NOT
    * portable — Spark rounds HALF_UP on the shortest-decimal repr
    * (`BigDecimal.valueOf`) while DuckDB's tie behavior on doubles has
    * changed across versions, which cost round 9 the `q_embedding_drift`
    * gate. Oracle side must spell the SAME form:
    * `CAST(floor(x * 1e9 + 0.5) AS BIGINT)`.
    *
    * Companion rule (the round-10/11 `q_embedding_drift` lesson): a gate
    * face must never OUTPUT a DECIMAL-typed column either — wide-decimal
    * rendering differs across DuckDB versions at the driver's compare.
    * Fold wide integers to BIGINT mod 2^61−1 (the `q_dsir_modweights` /
    * `drift_mod` recipe) or emit digits as STRING; `tools/check.py`
    * fails loud on any DECIMAL output column.
    *
    * DOUBLE output rule (r11 verdict #5, wired r13): a query may emit a
    * DOUBLE column only when every float op on the path to it is a
    * fixed IEEE-754 op sequence both engines compute bit-identically —
    * `+ - * /` and `sqrt` (all correctly rounded per the standard) over
    * identical operands, or a decimal-exact [[dsum]] cast at the edge.
    * NOT portable: `round()` on doubles (version-dependent ties — the
    * r9 lesson), float `avg()`/`stddev`/`corr()` (summation-order-
    * dependent; emit decimal-exact sum components and divide at the
    * edge instead), and strictly speaking `ln()`/`exp()` (not required
    * to be correctly rounded — JVM and DuckDB libm have agreed at every
    * gate since r5, tolerated in `q_bm25`/`q_hybrid_rrf` only).
    * Reviewed queries live in `tools/float_allowlist.txt` (one name per
    * line, reasons in the header); `tools/check.py` fails loud on any
    * DOUBLE/FLOAT output column from a query not on that list. A new
    * float-emitting query means reviewing it against this rule and
    * adding it there deliberately — or folding through [[ppb]].
    */
  def ppb(c: Column): Column =
    floor(c.cast(DoubleType) * lit(1e9) + lit(0.5)).cast(LongType)

  /** Exact decimal image of a ≤4-decimal double. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a ≤4-decimal double, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  def asLong(c: Column): Column = c.cast(LongType)
}
