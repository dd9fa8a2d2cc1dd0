package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q_quantile_stats uses the EXACT interpolated `percentile` (oracle-
  * matched bitwise vs DuckDB quantile_cont). At 100 TB exact percentile
  * holds per-group value multisets in the agg buffer — fine for bounded
  * groups, wrong for billions of distinct values; the scale path is
  * `approx_percentile` (t-digest-style sketch, constant memory, partial
  * agg merges). This spec pins the swap's error contract.
  */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = {
    // log-normal-ish long tail, fixed seed
    val rnd = new scala.util.Random(11)
    (1 to 20000).map(i =>
      (i.toLong, math.exp(rnd.nextGaussian() * 1.5 + 5.0).toLong max 1L))
      .toDF("id", "v")
  }

  test("approx_percentile stays within rank-error bounds of the exact " +
    "percentile at accuracy 10000 on a long-tailed distribution") {
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val exact = skewed.select(
      expr(s"percentile(v, array(${ps.mkString(",")}))")).as[Seq[Double]].head()
    val approx = skewed.select(
      expr(s"approx_percentile(v, array(${ps.mkString(",")}), 10000)"))
      .as[Seq[Long]].head()
    // approx_percentile guarantees a RANK error <= n/accuracy; translate
    // by checking the approximate answer's true rank sits within that
    // band of the target rank
    val n = skewed.count()
    val tol = (n / 10000.0).ceil.toLong + 1
    ps.zip(approx).foreach { case (p, a) =>
      // with duplicate values the returned element occupies a rank
      // INTERVAL [count(v<a)+1, count(v<=a)]; the guarantee is that this
      // interval touches the tolerance band around the target rank
      val lo = skewed.filter(col("v") < a).count() + 1
      val hi = skewed.filter(col("v") <= a).count()
      val target = (p * n).toLong
      assert(lo <= target + tol && hi >= target - tol,
        s"p=$p approx=$a rankInterval=[$lo,$hi] target=$target tol=$tol")
    }
    // and at these accuracies the medians agree to within one value step
    assert(math.abs(approx(1) - exact(1)) <= math.max(1.0, exact(1) * 0.01))
  }

  test("approx_percentile is deterministic across partitioning (sketch " +
    "merge is order-insensitive here)") {
    val a = skewed.repartition(3)
      .select(expr("approx_percentile(v, 0.5, 5000)")).as[Long].head()
    val b = skewed.repartition(17)
      .select(expr("approx_percentile(v, 0.5, 5000)")).as[Long].head()
    assert(a == b, s"median moved with partitioning: $a vs $b")
  }
}
