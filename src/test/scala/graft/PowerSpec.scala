package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Power

class PowerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(a: Seq[Double], b: Seq[Double]) =
    (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")

  test("hand moments: MDE = (z_a + z_p) * se, absolute and relative") {
    // A = [1,2,3,4]: var 5/3; B = [2,4,6]: var 4
    // se² = (5/3)/4 + 4/3 = 1.75
    val r = Power.minimumDetectableEffect(
        df(Seq(1, 2, 3, 4), Seq(2, 4, 6)), "g", "v", "A", "B",
        Seq(0.05 -> 0.80)).collect().head
    val exp = (Power.AlphaZ(0.05) + Power.PowerZ(0.80)) *
      math.sqrt(1.75)
    assert(math.abs(r.getAs[Double]("mde_abs") - exp) < 1e-12)
    assert(math.abs(r.getAs[Double]("mde_rel") - exp / 2.5) < 1e-12)
  }

  test("one row per design; stricter designs need bigger effects") {
    val rows = Power.minimumDetectableEffect(
        df((1 to 30).map(_.toDouble), (1 to 30).map(i => (i * 2).toDouble)),
        "g", "v", "A", "B",
        Seq(0.05 -> 0.80, 0.01 -> 0.90, 0.10 -> 0.80))
      .collect()
      .map(r => (r.getAs[Double]("alpha"), r.getAs[Double]("power"))
        -> r.getAs[Double]("mde_abs")).toMap
    assert(rows.size == 3)
    assert(rows((0.01, 0.9)) > rows((0.05, 0.8)))
    assert(rows((0.1, 0.8)) < rows((0.05, 0.8)))
  }

  test("n < 2 in a group → NULL MDE; zero mean → NULL relative only") {
    val r = Power.minimumDetectableEffect(
        df(Seq(1), Seq(2, 3)), "g", "v", "A", "B", Seq(0.05 -> 0.80))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("mde_abs")))
    val z = Power.minimumDetectableEffect(
        df(Seq(-1, 0, 1), Seq(2, 3, 4)), "g", "v", "A", "B",
        Seq(0.05 -> 0.80)).collect().head
    assert(!z.isNullAt(z.fieldIndex("mde_abs")))
    assert(z.isNullAt(z.fieldIndex("mde_rel"))) // percent of zero
  }

  test("unsupported designs and empty groups fail loudly") {
    intercept[IllegalArgumentException] {
      Power.minimumDetectableEffect(df(Seq(1), Seq(2)), "g", "v",
        "A", "B", Seq(0.07 -> 0.80))
    }
    // slots swapped — each key must validate against its OWN table, not a
    // shared map that would silently compute with the wrong quantile
    intercept[IllegalArgumentException] {
      Power.minimumDetectableEffect(df(Seq(1), Seq(2)), "g", "v",
        "A", "B", Seq(0.90 -> 0.80))
    }
    intercept[IllegalArgumentException] {
      Power.minimumDetectableEffect(df(Seq(1), Seq(2)), "g", "v",
        "A", "B", Seq(0.05 -> 0.01))
    }
    val e = intercept[Exception] {
      Power.minimumDetectableEffect(df(Seq(1), Seq()), "g", "v",
        "A", "B", Seq(0.05 -> 0.80)).collect()
    }
    assert(e.getMessage.contains("empty sample"))
  }
}
