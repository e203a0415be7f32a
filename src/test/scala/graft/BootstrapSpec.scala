package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bootstrap

class BootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** JVM replica of Sampling.hashUnit: first 8 hex chars of sha256, as a
    * fraction of 2³². */
  private def hashUnit(key: String): Double = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def weight(u: Double): Int = Bootstrap.PoissonCdf.count(u >= _)

  /** Driver-side reference of the whole derivation: weights → replicate
    * means → (1−d)·lo + d·hi percentile interpolation. */
  private def reference(rows: Seq[(String, String, Double)], b: Int,
                        alpha: Double): Map[String, (Double, Double, Double)] =
    rows.groupBy(_._2).map { case (g, rs) =>
      val mean = rs.map(_._3).sum / rs.size
      val means = (0 until b).flatMap { j =>
        val ws = rs.map(r => (weight(hashUnit(s"${r._1}:boot:$j")), r._3))
        val sw = ws.map(_._1).sum
        if (sw == 0) None
        else Some(ws.map { case (w, v) => w * v }.sum / sw)
      }.sorted
      def q(p: Double): Double = {
        val h = (means.size - 1).toDouble * p
        val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
        val d = h - math.floor(h)
        (1.0 - d) * means(lo) + d * means(hi)
      }
      g -> (mean, q(alpha / 2), q(1 - alpha / 2))
    }

  private val fixture = Seq(
    ("d1", "g1", 10.0), ("d2", "g1", 12.0), ("d3", "g1", 14.0),
    ("d4", "g1", 11.0), ("d5", "g1", 13.0), ("d6", "g1", 55.0),
    ("d7", "g2", 100.0), ("d8", "g2", 102.0), ("d9", "g2", 98.0),
    ("d10", "g2", 101.0))

  test("matches the driver-side reference: weights, means, interpolation") {
    val got = Bootstrap.poissonBootstrapCI(
        fixture.toDF("id", "g", "v").repartition(7), "id", "g", "v",
        replicates = 50, alpha = 0.1)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"),
          r.getAs[Double]("ci_hi"))).toMap
    val want = reference(fixture, 50, 0.1)
    assert(got.keySet == want.keySet)
    got.foreach { case (g, (m, lo, hi)) =>
      val (wm, wlo, whi) = want(g)
      assert(math.abs(m - wm) < 1e-9, s"mean@$g")
      assert(math.abs(lo - wlo) < 1e-9, s"ci_lo@$g: $lo vs $wlo")
      assert(math.abs(hi - whi) < 1e-9, s"ci_hi@$g: $hi vs $whi")
    }
  }

  test("deterministic and partitioning-invariant") {
    def run(parts: Int) = Bootstrap.poissonBootstrapCI(
        fixture.toDF("id", "g", "v").repartition(parts), "id", "g", "v",
        replicates = 40, alpha = 0.05)
      .orderBy("g").collect().toSeq.map(_.toSeq)
    assert(run(1) == run(13))
  }

  test("interval is ordered and brackets the point mean on balanced data") {
    val rows = (1 to 200).map(i => (s"d$i", "g", 100.0 + (i % 21) - 10))
    val r = Bootstrap.poissonBootstrapCI(
        rows.toDF("id", "g", "v"), "id", "g", "v",
        replicates = 100, alpha = 0.05)
      .collect().head
    val (m, lo, hi) = (r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
    assert(lo <= hi)
    assert(lo <= m && m <= hi, s"CI [$lo, $hi] must bracket mean $m")
    // 200 draws of a ±10 metric: the mean's CI is a few units wide, not 0
    assert(hi - lo > 0.1 && hi - lo < 10.0, s"width ${hi - lo}")
  }

  test("weights are hash-uniform: mean multiplicity ~ Poisson(1) mean 1") {
    val n = 400
    val draws = for (i <- 1 to n; j <- 0 until 50)
      yield weight(hashUnit(s"w$i:boot:$j"))
    val mean = draws.sum.toDouble / draws.size
    assert(math.abs(mean - 1.0) < 0.02, s"mean weight $mean")
    assert(draws.count(_ == 0).toDouble / draws.size > 0.3) // ~e⁻¹
  }

  test("cluster form: whole clusters enter or leave a replicate together; " +
    "coincides with the row form on unique keys") {
    // two rows per cluster with OPPOSITE deviations: a row-level resample
    // can split them (variance from within-cluster noise), the cluster
    // form cannot — each replicate mean over a fully-kept cluster pair is
    // exactly the cluster mean, so the CI must collapse to the point mean
    val paired = (1 to 40).flatMap { c =>
      Seq((s"c$c", "g", 100.0 + c), (s"c$c", "g", 100.0 - c))
    }
    val r = Bootstrap.clusterPoissonBootstrapCI(
        paired.toDF("cl", "g", "v"), "cl", "g", "v",
        replicates = 60, alpha = 0.1).collect().head
    assert(math.abs(r.getAs[Double]("mean") - 100.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_lo") - 100.0) < 1e-9
      && math.abs(r.getAs[Double]("ci_hi") - 100.0) < 1e-9,
      s"balanced-pair clusters must collapse the CI: $r")
    // row-level resampling on the same data has genuine width
    val row = Bootstrap.poissonBootstrapCI(
        paired.zipWithIndex.map { case ((c, g, v), i) => (s"r$i", g, v) }
          .toDF("id", "g", "v"), "id", "g", "v",
        replicates = 60, alpha = 0.1).collect().head
    assert(row.getAs[Double]("ci_hi") - row.getAs[Double]("ci_lo") > 1.0)
    // unique cluster keys ≡ the row form (within fold tolerance — the
    // cluster path pre-sums per cluster, reordering the IEEE fold)
    val uniq = fixture.map { case (id, g, v) => (id, g, v) }
    def nums(r: org.apache.spark.sql.Row) = Seq(
      r.getAs[Double]("mean"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
    val a = Bootstrap.poissonBootstrapCI(uniq.toDF("id", "g", "v"),
      "id", "g", "v", replicates = 30, alpha = 0.1)
      .orderBy("g").collect().toSeq
    val b = Bootstrap.clusterPoissonBootstrapCI(uniq.toDF("id", "g", "v"),
      "id", "g", "v", replicates = 30, alpha = 0.1)
      .orderBy("g").collect().toSeq
    assert(a.size == b.size)
    a.zip(b).foreach { case (x, y) =>
      nums(x).zip(nums(y)).foreach { case (p, q) =>
        assert(math.abs(p - q) < 1e-9, s"$x vs $y")
      }
    }
  }

  test("guards: alpha range, replicate floor, NULL inputs loud") {
    intercept[IllegalArgumentException] {
      Bootstrap.poissonBootstrapCI(fixture.toDF("id", "g", "v"),
        "id", "g", "v", replicates = 1, alpha = 0.05)
    }
    intercept[IllegalArgumentException] {
      Bootstrap.poissonBootstrapCI(fixture.toDF("id", "g", "v"),
        "id", "g", "v", replicates = 10, alpha = 1.0)
    }
    val e = intercept[Exception] {
      Bootstrap.poissonBootstrapCI(
        Seq((Some("a"), "g", 1.0), (None, "g", 2.0)).toDF("id", "g", "v"),
        "id", "g", "v", replicates = 10, alpha = 0.05).collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
