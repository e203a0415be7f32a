package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Conformal

class ConformalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def thrMap(df: org.apache.spark.sql.DataFrame): Map[Double, (Long, Option[Double])] =
    df.collect().map { r =>
      r.getAs[Double]("alpha") ->
        (r.getAs[Long]("k"),
          if (r.isNullAt(r.fieldIndex("threshold"))) None
          else Some(r.getAs[Double]("threshold")))
    }.toMap

  test("quantileThresholds: hand-computed ranks on 1..9") {
    // n = 9: α=0.5 → k = ⌈10·0.5⌉ = 5 → 5th smallest = 5
    //        α=0.1 → k = ⌈10·0.9⌉ = 9 → 9
    //        α=0.05 → k = ⌈10·0.95⌉ = 10 > 9 → NULL (unattainable)
    val cal = (1 to 9).map(_.toDouble).toDF("s")
    val got = thrMap(Conformal.quantileThresholds(cal, "s",
      Seq(0.5, 0.1, 0.05)))
    assert(got(0.5) == (5L, Some(5.0)))
    assert(got(0.1) == (9L, Some(9.0)))
    assert(got(0.05) == (10L, None))
  }

  test("quantileThresholds: duplicated scores — k-th smallest VALUE is well-defined") {
    // cal = [1,1,1,2]: α=0.25 → k = ⌈5·0.75⌉ = 4 → 4th smallest = 2
    //                  α=0.5  → k = ⌈5·0.5⌉  = 3 → 3rd smallest = 1
    val cal = Seq(1.0, 1.0, 1.0, 2.0).toDF("s")
    val got = thrMap(Conformal.quantileThresholds(cal, "s", Seq(0.25, 0.5)))
    assert(got(0.25) == (4L, Some(2.0)))
    assert(got(0.5) == (3L, Some(1.0)))
  }

  test("coverage: exact fraction against a hand threshold, flag fires sanely") {
    val cal = (1 to 99).map(_.toDouble).toDF("s")
    val thr = Conformal.quantileThresholds(cal, "s", Seq(0.1))
    // k = ⌈100·0.9⌉ = 90 → threshold 90; test 1..100 → coverage 0.90
    val cov = Conformal.coverage((1 to 100).map(_.toDouble).toDF("s"),
      "s", thr).collect().head
    assert(cov.getAs[Double]("threshold") == 90.0)
    assert(cov.getAs[Long]("n_test") == 100L)
    assert(math.abs(cov.getAs[Double]("test_coverage") - 0.9) < 1e-15)
    assert(cov.getAs[Boolean]("meets_guarantee"))
  }

  test("coverage: NULL (unattainable) threshold propagates NULL coverage and flag") {
    val cal = Seq(1.0, 2.0).toDF("s")
    val thr = Conformal.quantileThresholds(cal, "s", Seq(0.05)) // k=3 > 2
    val cov = Conformal.coverage(Seq(1.0, 5.0).toDF("s"), "s", thr)
      .collect().head
    assert(cov.isNullAt(cov.fieldIndex("threshold")))
    assert(cov.isNullAt(cov.fieldIndex("test_coverage")))
    assert(cov.isNullAt(cov.fieldIndex("meets_guarantee")))
  }

  test("marginal validity: hash-split calibration keeps empirical coverage near 1 - alpha") {
    // a deterministic score population with ties and skew; split by parity
    // of a hash-ish mix (exchangeable enough for a 3-sigma check)
    val scores = (1 to 2000).map(i => ((i * 2654435761L) % 1000).toDouble)
    val cal = scores.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toDF("s")
    val test = scores.zipWithIndex.filter(_._2 % 2 == 1).map(_._1).toDF("s")
    val out = Conformal.coverage(test, "s",
      Conformal.quantileThresholds(cal, "s", Seq(0.2, 0.1))).collect()
    out.foreach { r =>
      assert(r.getAs[Boolean]("meets_guarantee"),
        s"alpha=${r.getAs[Double]("alpha")} coverage=${r.getAs[Double]("test_coverage")}")
    }
  }

  test("guards: NULL score fails loudly; bad alphas rejected") {
    val df = Seq(Some(1.0), None).toDF("s")
    val ex = intercept[Exception] {
      Conformal.quantileThresholds(df, "s", Seq(0.1)).collect()
    }
    assert(ex.getMessage.contains("NULL score"))
    intercept[IllegalArgumentException](
      Conformal.quantileThresholds(Seq(1.0).toDF("s"), "s", Seq(0.0)))
    intercept[IllegalArgumentException](
      Conformal.quantileThresholds(Seq(1.0).toDF("s"), "s", Nil))
  }

  test("thresholds are exactly reproducible across partitionings") {
    val rows = (1 to 500).map(i => (i % 97).toDouble)
    val a = thrMap(Conformal.quantileThresholds(rows.toDF("s"), "s",
      Seq(0.1, 0.01)))
    val b = thrMap(Conformal.quantileThresholds(
      rows.toDF("s").repartition(17), "s", Seq(0.1, 0.01)))
    assert(a == b)
  }
}
