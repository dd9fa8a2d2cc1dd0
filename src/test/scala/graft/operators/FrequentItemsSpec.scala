package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FrequentItemsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Zipf-ish corpus: token t_i appears ~N/i times
  private lazy val zipf = {
    val words = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"t$i"))
    val shuffled = words.zipWithIndex
      .sortBy { case (_, ix) => (ix * 7919) % 10007 }.map(_._1)
    shuffled.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
  }

  private lazy val exact = zipf
    .select(explode(split(col("text"), " ")).as("tok"))
    .groupBy("tok").agg(count(lit(1)).as("cnt"))
    .as[(String, Long)].collect().toMap
  private lazy val nTotal = exact.values.sum

  test("heavyHitters (exact): exactly the tokens at or above the " +
    "frequency floor, with exact counts") {
    val got = FrequentItems.heavyHitters(zipf, "text", minFrac = 0.02)
      .select("tok", "cnt").as[(String, Long)].collect().toMap
    val expected = exact.filter { case (_, c) => c.toDouble >= nTotal * 0.02 }
    assert(got == expected)
  }

  test("approxHeavyHitters: Misra-Gries guarantees hold — every token " +
    "above n/m is present, counts bracket the truth, summary size <= m") {
    val m = 20
    val got = FrequentItems.approxHeavyHitters(zipf, "text", m)
      .select("tok", "min_count", "err_bound")
      .as[(String, Long, Long)].collect()
    assert(got.length <= m)
    val bound = nTotal / m
    assert(got.forall(_._3 == bound))
    // presence: true count > n/m ⇒ in the summary
    val present = got.map(_._1).toSet
    exact.foreach { case (t, c) =>
      if (c > bound) assert(present.contains(t), s"$t (count $c) missing")
    }
    // count bracketing: min_count <= true <= min_count + n/m
    got.foreach { case (t, mc, eb) =>
      val truth = exact(t)
      assert(mc <= truth && truth <= mc + eb,
        s"$t reported $mc, truth $truth, bound $eb")
    }
  }

  test("approxHeavyHitters: capacity >= distinct vocabulary recovers " +
    "exact counts (no decrement ever fires)") {
    val got = FrequentItems.approxHeavyHitters(zipf, "text", m = 100)
      .select("tok", "min_count").as[(String, Long)].collect().toMap
    assert(got == exact)
  }

  test("approxHeavyHitters: guarantees hold under any partitioning " +
    "(mergeable-summaries property)") {
    val m = 10
    val bound = nTotal / m
    for (parts <- Seq(1, 7, 32)) {
      val got = FrequentItems.approxHeavyHitters(
        zipf.repartition(parts), "text", m)
        .select("tok", "min_count").as[(String, Long)].collect().toMap
      exact.foreach { case (t, c) =>
        if (c > bound) {
          assert(got.contains(t), s"parts=$parts: $t missing")
          assert(got(t) <= c && c <= got(t) + bound)
        }
      }
    }
  }
}
