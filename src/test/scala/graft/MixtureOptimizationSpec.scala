package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{LogisticRegression, MixtureOptimization}

/** Pins the DoReMi-style reweighting loop: the weighted trainer's exact
  * backward compatibility, the uniform fixed point (equal shares make the
  * first refit BIT-IDENTICAL to the reference, so weights never move), the
  * Group-DRO upweighting direction on a genuinely conflicted corpus, and
  * run-to-run determinism. */
class MixtureOptimizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(rowsPerDomain: Map[String, Int]) = {
    // domain A: y = [x > 0]; domain B: the OPPOSITE rule — a single linear
    // model must pick a side, so the mixture genuinely matters
    val rows = rowsPerDomain.toSeq.sortBy(_._1).flatMap { case (d, n) =>
      (0 until n).map { i =>
        val x = (i % 7).toDouble - 3.0
        val y = if (d == "B") (if (x < 0) 1.0 else 0.0)
                else (if (x > 0) 1.0 else 0.0)
        (d, x, (i % 5).toDouble, y)
      }
    }
    rows.toDF("dom", "x1", "x2", "y").repartition(4)
  }

  test("trainWeighted with weight 1.0 reproduces train bit-exactly") {
    val df = fixture(Map("A" -> 60, "B" -> 40))
    val a = LogisticRegression.train(df, Seq("x1", "x2"), "y", iters = 12)
    val b = LogisticRegression.trainWeighted(df, Seq("x1", "x2"), "y",
      lit(1.0), iters = 12)
    assert(a.weights == b.weights && a.bias == b.bias && a.losses == b.losses)
  }

  test("trainWeighted rejects non-positive and NULL weights loudly") {
    val df = fixture(Map("A" -> 20))
    val e = intercept[IllegalArgumentException] {
      LogisticRegression.trainWeighted(df, Seq("x1"), "y",
        when(col("x1") > 0, lit(1.0)).otherwise(lit(0.0)), iters = 2)
    }
    assert(e.getMessage.contains("weights"))
  }

  test("equal shares are an exact fixed point: weights stay uniform") {
    // ω = (1/K)/(1/K) = 1.0 exactly, so the first refit IS the reference
    // fit bit-for-bit, excess is exactly 0, and EG never moves
    val df = fixture(Map("A" -> 50, "B" -> 50))
    val res = MixtureOptimization.doremiWeights(df, "dom",
      Seq("x1", "x2"), "y", steps = 3, eta = 5.0, itersPerStep = 6)
    assert(res.weights.map(_.weight) == Seq(0.5, 0.5))
    assert(res.weights.forall(_.excess == 0.0))
    assert(res.refModel.weights == res.finalModel.weights &&
      res.refModel.bias == res.finalModel.bias)
  }

  test("the domain the by-count reference favors gains weight under DRO") {
    // A dominates by count, so the unweighted reference fits A's rule;
    // the first refit targets the UNIFORM mixture (upweighting B), hurting
    // A vs its reference loss — excess_A > 0, excess_B = 0 — so EG pushes
    // weight toward A above its uniform 0.5 start
    val res = MixtureOptimization.doremiWeights(
      fixture(Map("A" -> 160, "B" -> 40)), "dom",
      Seq("x1", "x2"), "y", steps = 1, eta = 2.0, itersPerStep = 10)
    val byDom = res.weights.map(w => w.domain -> w).toMap
    assert(byDom("A").excess > 0.0, "reference-favored domain must lose " +
      s"under the uniform-target refit: ${byDom("A")}")
    assert(byDom("A").weight > 0.5 && byDom("B").weight < 0.5,
      s"EG must upweight the hurt domain: ${res.weights}")
    assert(math.abs(res.weights.map(_.weight).sum - 1.0) < 1e-12)
    assert(res.weights.forall(_.weight > 0))
  }

  test("deterministic across runs for a fixed partitioning") {
    def run() = MixtureOptimization.doremiWeights(
      fixture(Map("A" -> 90, "B" -> 30, "C" -> 60)), "dom",
      Seq("x1", "x2"), "y", steps = 2, eta = 1.5, itersPerStep = 5)
      .weights
    assert(run() == run())
  }

  test("NULL domains and domain blowup fail loudly") {
    val df = fixture(Map("A" -> 20, "B" -> 20))
    val withNull = df.withColumn("dom",
      when(col("x1") === 0.0, lit(null: String)).otherwise(col("dom")))
    assert(intercept[IllegalArgumentException] {
      MixtureOptimization.doremiWeights(withNull, "dom", Seq("x1"), "y",
        steps = 1, itersPerStep = 2)
    }.getMessage.contains("NULL domain"))
    assert(intercept[IllegalArgumentException] {
      MixtureOptimization.doremiWeights(df, "dom", Seq("x1"), "y",
        steps = 1, itersPerStep = 2, maxDomains = 1)
    }.getMessage.contains("maxDomains"))
  }
}
