package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EmbeddingPcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Same calibrated clustered corpus as the ANN specs. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val rows = for (c <- 0 until 20; i <- 0 until 25) yield
      (c.toLong * 25 + i,
        centers(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq,
        c)
    rows.toDF("id", "embedding", "label")
  }

  test("components are orthonormal, eigenvalues descend, explained " +
    "variance is monotone and reaches ~1 at full rank") {
    val m = EmbeddingPca.fit(clustered, "embedding", k = 16)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map(p => p._1 * p._2).sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-9)
      else assert(math.abs(dot) < 1e-9)
    }
    assert(m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-9))
    val ev = (1 to 16).map(m.explainedVariance)
    assert(ev == ev.sorted)
    assert(math.abs(ev.last - 1.0) < 1e-9)
  }

  test("jacobi recovers a known spectrum") {
    // diag(5, 2, 1) rotated by a fixed orthogonal matrix
    val m = Array(
      Array(3.1, -1.4, 0.3),
      Array(-1.4, 2.6, -0.5),
      Array(0.3, -0.5, 2.3))
    val (vals, vecs) = EmbeddingPca.jacobiEigen(m)
    // eigen equation: M v = λ v for each eigenpair
    for (c <- 0 until 3) {
      val v = Array.tabulate(3)(r => vecs(r)(c))
      val mv = m.map(row => row.zip(v).map(p => p._1 * p._2).sum)
      mv.zip(v.map(_ * vals(c))).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"eigen residual $x vs $y")
      }
    }
    assert(math.abs(vals.sum - (3.1 + 2.6 + 2.3)) < 1e-9) // trace preserved
  }

  test("projecting 16-d clusters to 8-d preserves cluster structure: " +
    "every projected neighbor shares its query's cluster") {
    // within-cluster ordering rides on isotropic 0.1-sigma noise that NO
    // projection can keep, so the meaningful invariant is cluster
    // membership of neighbors, not exact ranks
    val m = EmbeddingPca.fit(clustered, "embedding", k = 8)
    assert(m.explainedVariance(8) > 0.5)
    val reduced = EmbeddingPca.transform(clustered, "embedding", m)
    val labels = clustered.select($"id", $"label")
      .as[(Long, Int)].collect().toMap
    val qr = reduced.filter($"id" % 25 === 0)
    val proj = Similarity.bruteForceTopK(qr, reduced, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(proj.nonEmpty)
    val agree = proj.count { case (q, n) => labels(q) == labels(n) }
    assert(agree == proj.length,
      s"only $agree/${proj.length} projected neighbors kept their cluster")
  }
}
