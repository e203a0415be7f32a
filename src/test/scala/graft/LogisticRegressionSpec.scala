package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LogisticRegression
import graft.functions.Scoring

/** Pins for the distributed quality-classifier trainer: recovery of a
  * planted decision rule, monotone loss, parity with a driver-side
  * reference GD, composition with applyLinearModel, and input guards. */
class LogisticRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Linearly separable-ish fixture: y = 1 iff 2·x1 − x2 + noise > 0. */
  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val y = if (2 * x1 - x2 + 0.3 * rnd.nextGaussian() > 0) 1.0 else 0.0
      (x1, x2, y)
    }
  }

  test("recovers a planted rule: accuracy ≥ 0.9, loss strictly non-increasing") {
    val df = fixture(2000, 7).toDF("x1", "x2", "y").repartition(8)
    val m = LogisticRegression.train(df, Seq("x1", "x2"), "y", iters = 60)
    assert(m.losses.size > 5, s"training stopped immediately: ${m.losses}")
    assert(m.losses.zip(m.losses.tail).forall { case (a, b) => b <= a },
      s"loss increased: ${m.losses}")
    assert(m.losses.last < 0.35, s"did not fit: final loss ${m.losses.last}")
    // the planted direction: w1 > 0 > w2, |w1| ≈ 2|w2|
    val w = m.weights.toMap
    assert(w("x1") > 0 && w("x2") < 0, s"wrong signs: $w")
    // composition: the returned RAW-space model scores the original frame
    val acc = Scoring.applyLinearModel(df, m.weights, m.bias)
      .select(avg(when(col("keep") === (col("y") === 1.0), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("matches a driver-side reference GD to high precision") {
    val rows = fixture(400, 13)
    val df = rows.toDF("x1", "x2", "y").repartition(4)
    val m = LogisticRegression.train(df, Seq("x1", "x2"), "y",
      iters = 25, lr = 1.0)
    // same algorithm sequentially: standardize, GD with halving-on-increase
    val xs = rows.map(t => Array(t._1, t._2)); val ys = rows.map(_._3)
    val n = xs.size
    val mu = Array(xs.map(_(0)).sum / n, xs.map(_(1)).sum / n)
    val sd = Array.tabulate(2) { j =>
      val v = xs.map(x => x(j) * x(j)).sum / n - mu(j) * mu(j)
      if (v <= 1e-300) 1.0 else math.sqrt(v)
    }
    val z = xs.map(x => Array.tabulate(2)(j => (x(j) - mu(j)) / sd(j)))
    def lg(w: Array[Double], b: Double) = {
      var loss = 0.0; val g = Array(0.0, 0.0); var gb = 0.0
      z.zip(ys).foreach { case (x, y) =>
        val mgn = b + w(0) * x(0) + w(1) * x(1)
        val p = 1.0 / (1.0 + math.exp(-mgn))
        loss += math.max(mgn, 0) - y * mgn + math.log1p(math.exp(-math.abs(mgn)))
        g(0) += (p - y) * x(0); g(1) += (p - y) * x(1); gb += p - y
      }
      (loss / n, g.map(_ / n), gb / n)
    }
    var w = Array(0.0, 0.0); var b = 0.0; var rate = 1.0
    var (curL, curG, curGb) = lg(w, b)
    var it = 0
    while (it < 25) {
      val wN = Array(w(0) - rate * curG(0), w(1) - rate * curG(1))
      val bN = b - rate * curGb
      val (nl, ng, ngb) = lg(wN, bN)
      if (nl <= curL) {
        w = wN; b = bN
        val stop = curL - nl < 1e-7
        curL = nl; curG = ng; curGb = ngb
        if (stop) it = 25
      } else rate /= 2
      it += 1
    }
    val refW = Array(w(0) / sd(0), w(1) / sd(1))
    val refB = b - w(0) * mu(0) / sd(0) - w(1) * mu(1) / sd(1)
    val got = m.weights.toMap
    assert(math.abs(got("x1") - refW(0)) < 1e-6 &&
      math.abs(got("x2") - refW(1)) < 1e-6 && math.abs(m.bias - refB) < 1e-6,
      s"got $got/${m.bias} vs ref ${refW.toSeq}/$refB")
  }

  test("constant feature gets σ := 1 and ~zero weight; L2 shrinks weights") {
    val df = fixture(500, 3).map(t => (t._1, 5.0, t._3)).toDF("x1", "c", "y")
    val m = LogisticRegression.train(df, Seq("x1", "c"), "y", iters = 40)
    assert(math.abs(m.weights.toMap.apply("c")) < 1e-9,
      "constant feature must get no gradient signal")
    val free = LogisticRegression.train(df, Seq("x1"), "y", iters = 40)
    val reg = LogisticRegression.train(df, Seq("x1"), "y", iters = 40, l2 = 1.0)
    assert(math.abs(reg.weights.head._2) < math.abs(free.weights.head._2),
      "L2 must shrink the coefficient")
  }

  test("guards: bad labels, NaN features, empty input fail loud") {
    val badLabel = Seq((1.0, 2.0), (0.5, 1.0)).toDF("y", "x")
    intercept[IllegalArgumentException](
      LogisticRegression.train(badLabel, Seq("x"), "y", iters = 2))
    val nanFeat = Seq((1.0, Double.NaN), (0.0, 1.0)).toDF("y", "x")
    intercept[IllegalArgumentException](
      LogisticRegression.train(nanFeat, Seq("x"), "y", iters = 2))
    val empty = Seq.empty[(Double, Double)].toDF("y", "x")
    intercept[IllegalArgumentException](
      LogisticRegression.train(empty, Seq("x"), "y", iters = 2))
  }
}
