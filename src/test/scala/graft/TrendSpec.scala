package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Trend

class TrendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(series: Seq[(String, Int, Double)]) =
    Trend.mannKendall(series.toDF("k", "o", "v"), "k", "o", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap

  test("strictly increasing series: S = n(n-1)/2, slope exact, z positive") {
    // v = 2·o: all 10 pairs concordant, every pairwise slope = 2
    val m = run((1 to 5).map(i => ("up", i, 2.0 * i)))
    val r = m("up")
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("s") == 10L)
    // var = 5·4·15/18 (no ties)
    assert(r.getAs[Double]("var_s") == 300.0 / 18.0)
    assert(math.abs(r.getAs[Double]("z")
      - 9.0 / math.sqrt(300.0 / 18.0)) < 1e-14)
    assert(r.getAs[Double]("sen_slope") == 2.0)
  }

  test("hand mixed series: S, tie-corrected variance, median slope") {
    // v = [3, 1, 3, 4] at o = 1..4; signs: (1,2)−, (1,3)0, (1,4)+,
    // (2,3)+, (2,4)+, (3,4)+ → S = 3
    // value tie group {3,3}: t=2 → Σ t(t−1)(2t+5) = 18
    // var = (4·3·13 − 18)/18 = 138/18
    // slopes: −2, 0, 1/3, 2, 3/2, 1 → sorted [−2, 0, 1/3, 1, 3/2, 2]
    // median (even 6): (1/3 + 1)/2 = 2/3
    val m = run(Seq(("h", 1, 3.0), ("h", 2, 1.0), ("h", 3, 3.0),
      ("h", 4, 4.0)))
    val r = m("h")
    assert(r.getAs[Long]("s") == 3L)
    assert(r.getAs[Double]("var_s") == 138.0 / 18.0)
    assert(math.abs(r.getAs[Double]("z")
      - 2.0 / math.sqrt(138.0 / 18.0)) < 1e-14)
    assert(math.abs(r.getAs[Double]("sen_slope")
      - (1.0 / 3.0 + 1.0) / 2.0) < 1e-15)
  }

  test("constant series: S = 0, var 0 → NULL z, slope 0") {
    val r = run((1 to 4).map(i => ("flat", i, 7.0)))("flat")
    assert(r.getAs[Long]("s") == 0L)
    assert(r.getAs[Double]("var_s") == 0.0)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[Double]("sen_slope") == 0.0)
  }

  test("S = 0 with variance: continuity-corrected z is exactly 0") {
    val r = run(Seq(("zig", 1, 1.0), ("zig", 2, 2.0), ("zig", 3, 1.0),
      ("zig", 4, 2.0)))("zig")
    // signs: +, 0, +, −, 0, + → S = 2? recompute: pairs (1,2)+ (1,3)0
    // (1,4)+ (2,3)− (2,4)0 (3,4)+ → S = 2
    assert(r.getAs[Long]("s") == 2L)
    val dn = run(Seq(("d", 1, 2.0), ("d", 2, 1.0), ("d", 3, 2.0),
      ("d", 4, 1.0)))("d")
    assert(dn.getAs[Long]("s") == -2L)
    assert(dn.getAs[Double]("z") < 0.0)
  }

  test("keys are independent; a singleton key keeps its row with NULL stats") {
    val m = run(Seq(("a", 1, 1.0), ("a", 2, 2.0), ("lone", 5, 9.0)))
    assert(m("a").getAs[Long]("s") == 1L)
    val lone = m("lone")
    assert(lone.getAs[Long]("n") == 1L)
    assert(lone.isNullAt(lone.fieldIndex("s")))
    assert(lone.isNullAt(lone.fieldIndex("var_s")))
    assert(lone.isNullAt(lone.fieldIndex("sen_slope")))
  }

  test("autocorrelation: hand acf(1) on a 4-point series") {
    // x = [1,2,3,4], x̄ = 2.5, den = Σ(x−x̄)² = 5
    // num(1) = (−1.5)(−0.5) + (−0.5)(0.5) + (0.5)(1.5) = 1.25
    val df = (1 to 4).map(i => ("a", i, i.toDouble)).toDF("k", "o", "v")
    val r = Trend.autocorrelation(df, "k", "o", "v", Seq(1))
      .collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("acf") - 0.25) < 1e-14)
  }

  test("autocorrelation: a period-2 alternation reads acf(2) ≈ +, acf(1) ≈ −") {
    val xs = (1 to 40).map(i => if (i % 2 == 0) 10.0 else 0.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i, x) }
      .toDF("k", "o", "v")
    val m = Trend.autocorrelation(df, "k", "o", "v", Seq(1, 2))
      .collect().map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf"))
      .toMap
    assert(m(1) < -0.9)
    assert(m(2) > 0.9)
  }

  test("autocorrelation: constant series and n ≤ lag → NULL") {
    val flat = (1 to 5).map(i => ("a", i, 3.0)).toDF("k", "o", "v")
    val r = Trend.autocorrelation(flat, "k", "o", "v", Seq(1))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("acf")))
    val short = (1 to 3).map(i => ("a", i, i.toDouble)).toDF("k", "o", "v")
    val s = Trend.autocorrelation(short, "k", "o", "v", Seq(5))
      .collect().head
    assert(s.isNullAt(s.fieldIndex("acf")))
  }

  test("autocorrelation: keys independent, one row per (key, lag)") {
    val df = ((1 to 6).map(i => ("up", i, i.toDouble)) ++
      (1 to 6).map(i => ("rnd", i, ((i * 7) % 5).toDouble)))
      .toDF("k", "o", "v")
    val rows = Trend.autocorrelation(df, "k", "o", "v", Seq(1, 2))
      .collect()
    assert(rows.length == 4)
    val up1 = rows.find(r => r.getString(0) == "up" && r.getInt(1) == 1)
      .get.getAs[Double]("acf")
    assert(up1 > 0.4) // a ramp is strongly positively autocorrelated
  }

  test("NULL value fails loudly") {
    val bad = Seq(("a", Some(1), Some(1.0)), ("a", Some(2), None))
      .toDF("k", "o", "v")
    val e = intercept[Exception] {
      Trend.mannKendall(bad, "k", "o", "v").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
