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

  /** `events` carries TIMESTAMP(NANOS) parquet, which Spark reads only as
    * long (`spark.sql.legacy.parquet.nanosAsLong`, set in Verify/Bench).
    * Truncate ns→µs here; DuckDB keeps ns but every query truncates to
    * ≥second granularity, so results agree.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Exact decimal image of a ≤4-decimal double. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent exact sum of a ≤4-decimal double, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  def asLong(c: Column): Column = c.cast(LongType)
}
