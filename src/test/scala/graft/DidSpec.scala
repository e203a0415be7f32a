package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Did

class DidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Boolean, Boolean, Double)]) =
    rows.toDF("tr", "po", "v")

  test("hand-computed 2x2: cell means, differences, DiD, unequal-variance se") {
    // T-pre [1,3] mean 2, T-post [4,8] mean 6, C-pre [2,4] mean 3,
    // C-post [3,7] mean 5 → diff_treat 4, diff_control 2, did 2;
    // each cell s²/n = (2 or 8)/2 → se² = 1+4+1+4 = 10
    val r = Did.differenceInDifferences(df(Seq(
        (true, false, 1.0), (true, false, 3.0),
        (true, true, 4.0), (true, true, 8.0),
        (false, false, 2.0), (false, false, 4.0),
        (false, true, 3.0), (false, true, 7.0))), "tr", "po", "v")
      .collect().head
    assert(r.getAs[Long]("n_tpre") == 2 && r.getAs[Long]("n_cpost") == 2)
    assert(math.abs(r.getAs[Double]("diff_treat") - 4.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("diff_control") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("did") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(10.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("t") - 2.0 / math.sqrt(10.0)) < 1e-12)
  }

  test("a singleton cell keeps the point estimate but NULLs se/t") {
    val r = Did.differenceInDifferences(df(Seq(
        (true, false, 2.0), // n = 1: no variance estimate
        (true, true, 6.0), (true, true, 6.0),
        (false, false, 3.0), (false, false, 3.0),
        (false, true, 5.0), (false, true, 5.0))), "tr", "po", "v")
      .collect().head
    assert(math.abs(r.getAs[Double]("did") - 2.0) < 1e-12)
    assert(r.isNullAt(r.fieldIndex("se")) && r.isNullAt(r.fieldIndex("t")))
  }

  test("an empty cell fails loudly — a 2x2 with a hole is not a DiD") {
    val e = intercept[Exception] {
      Did.differenceInDifferences(df(Seq(
          (true, true, 1.0), (false, false, 2.0), (false, true, 3.0))),
        "tr", "po", "v").collect()
    }
    assert(e.getMessage.contains("empty 2x2 cell"))
  }

  test("NULL treatment/period/metric fail loudly") {
    val e = intercept[Exception] {
      Did.differenceInDifferences(
        Seq((Some(true), true, 1.0), (None, true, 2.0),
          (Some(false), false, 3.0), (Some(false), true, 4.0),
          (Some(true), false, 5.0))
          .toDF("tr", "po", "v"), "tr", "po", "v").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
