package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cuped

class CupedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Double)]) =
    Cuped.welchTAdjusted(rows.toDF("g", "y", "x"), "g", "y", "x", "A", "B")
      .collect().head

  test("hand moments: theta, rho2, adjusted means, both t's") {
    // A: (x,y) = (1,3),(2,5); B: (3,8),(4,9)
    // pooled: θ = 3.5/(5/3) = 2.1, x̄ = 2.5
    // mean_adj_a = 4 − 2.1(1.5−2.5) = 6.1; mean_adj_b = 8.5 − 2.1 = 6.4
    // var_adj_a = 2 − 4.2 + 4.41·0.5 = 0.005; var_adj_b = 0.605
    val r = run(Seq(("A", 3.0, 1.0), ("A", 5.0, 2.0),
      ("B", 8.0, 3.0), ("B", 9.0, 4.0)))
    assert(math.abs(r.getAs[Double]("theta") - 2.1) < 1e-14)
    val vary = (179.0 - 156.25) / 3
    assert(math.abs(r.getAs[Double]("rho2")
      - 12.25 / ((5.0 / 3) * vary)) < 1e-14)
    assert(math.abs(r.getAs[Double]("mean_adj_a") - 6.1) < 1e-14)
    assert(math.abs(r.getAs[Double]("mean_adj_b") - 6.4) < 1e-14)
    val tRaw = (4.0 - 8.5) / math.sqrt(2.0 / 2 + 0.5 / 2)
    assert(math.abs(r.getAs[Double]("t_raw") - tRaw) < 1e-12)
    val tAdj = (6.1 - 6.4) / math.sqrt(0.005 / 2 + 0.605 / 2)
    assert(math.abs(r.getAs[Double]("t_adj") - tAdj) < 1e-9)
  }

  test("covariate explains the whole group gap: adjusted means meet, t_adj NULL at zero residual variance") {
    // y = 2x exactly in both groups → var_adj = 0 and the raw gap is
    // pure covariate imbalance
    val r = run(Seq(("A", 2.0, 1.0), ("A", 4.0, 2.0), ("A", 6.0, 3.0),
      ("B", 8.0, 4.0), ("B", 10.0, 5.0), ("B", 12.0, 6.0)))
    assert(math.abs(r.getAs[Double]("theta") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rho2") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_adj_a")
      - r.getAs[Double]("mean_adj_b")) < 1e-12)
    assert(r.getAs[Double]("t_raw") < 0.0)
    assert(r.isNullAt(r.fieldIndex("t_adj"))) // se² = 0 — fail-honest
  }

  test("constant covariate: theta/rho2/adjusted NULL, raw Welch still reads") {
    val r = run(Seq(("A", 1.0, 7.0), ("A", 2.0, 7.0),
      ("B", 4.0, 7.0), ("B", 6.0, 7.0)))
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.isNullAt(r.fieldIndex("rho2")))
    assert(r.isNullAt(r.fieldIndex("t_adj")))
    assert(!r.isNullAt(r.fieldIndex("t_raw")))
  }

  test("empty group and NULLs fail loudly") {
    val e = intercept[Exception] {
      run(Seq(("A", 1.0, 1.0)))
    }
    assert(e.getMessage.contains("empty sample"))
    val bad = Seq(("A", Some(1.0), Some(1.0)), ("B", None, Some(2.0)))
      .toDF("g", "y", "x")
    val e2 = intercept[Exception] {
      Cuped.welchTAdjusted(bad, "g", "y", "x", "A", "B").collect()
    }
    assert(e2.getMessage.contains("NULL"))
  }
}
