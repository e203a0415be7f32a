package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Forensics

class ForensicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(vs: Seq[Long]): Map[Int, (Long, Double, Double, Double)] =
    Forensics.benfordDigits(vs.toDF("v"), "v").collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("prop"),
          r.getAs[Double]("expected"), r.getAs[Double]("mad")))
      .toMap

  test("first digits come from the decimal rendering, counted exactly") {
    val m = run(Seq(1L, 19L, 123L, 2L, 29L, 3L, 555L, 9L, 91L, 987L))
    assert(m(1)._1 == 3L) // 1, 19, 123
    assert(m(2)._1 == 2L) // 2, 29
    assert(m(3)._1 == 1L)
    assert(m(5)._1 == 1L)
    assert(m(9)._1 == 3L) // 9, 91, 987
    assert(m(4)._1 == 0L && m(6)._1 == 0L) // absent digits still appear
    assert(m.size == 9)
  }

  test("expected proportions are Benford's law and telescope to 1") {
    val m = run(Seq(1L, 2L, 3L))
    for (d <- 1 to 9)
      assert(math.abs(m(d)._3 - math.log10(1.0 + 1.0 / d)) < 1e-15)
    assert(math.abs(m.values.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("mad is the mean absolute deviation over all 9 digits") {
    val m = run(Seq(1L, 1L, 2L)) // props: 2/3, 1/3, 0 ×7
    val exp = (1 to 9).map { d =>
      val p = if (d == 1) 2.0 / 3 else if (d == 2) 1.0 / 3 else 0.0
      math.abs(p - math.log10(1.0 + 1.0 / d))
    }.sum / 9.0
    assert(math.abs(m(1)._4 - exp) < 1e-14)
    assert(m.values.map(_._4).toSet.size == 1) // constant column
  }

  test("a Benford-ish geometric sample conforms; a narrow band does not") {
    // powers of 2 are the classic Benford-conforming sequence
    val pow2 = (0 until 60).map(i => BigInt(2).pow(i).toLong)
    val conform = run(pow2)(1)._4
    val narrow = run((250L to 299L)) // all first-digit 2
    assert(conform < 0.03)
    assert(narrow(2)._2 == 1.0)
    assert(narrow(1)._4 > 0.1) // wildly non-conforming, as it should read
  }

  test("non-positive and NULL values fail loudly") {
    val e = intercept[Exception] {
      Forensics.benfordDigits(Seq(5L, 0L).toDF("v"), "v").collect()
    }
    assert(e.getMessage.contains("positive"))
    val e2 = intercept[Exception] {
      Forensics.benfordDigits(Seq(Some(5L), None).toDF("v"), "v").collect()
    }
    assert(e2.getMessage.contains("positive"))
  }
}
