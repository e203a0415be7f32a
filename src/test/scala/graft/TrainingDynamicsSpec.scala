package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MixtureOptimization, TrainingDynamics}

/** Pins for the training-dynamics curation tier: cartography statistics
  * against hand computation, region boundaries on the ROUNDED values,
  * NULL-probability handling, RHO-loss ranking/tie order, and the UniMax
  * waterfilling closed form against a hand-run of the sequential rule. */
class TrainingDynamicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cartography matches hand-computed confidence/variability/correctness") {
    // example 1: p = 0.2, 0.4, 0.9 -> mean 0.5, popvar = (0.09+0.01+0.16)/3
    // example 2: p = 0.8, 0.8     -> mean 0.8, var 0, correct 2/2
    val df = Seq((1L, 0.2), (1L, 0.4), (1L, 0.9), (2L, 0.8), (2L, 0.8))
      .toDF("id", "p")
    val out = TrainingDynamics.cartography(df, "id", "p")
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 3)
    assert(math.abs(r1.getDouble(2) - 0.5) < 1e-12)
    assert(math.abs(r1.getDouble(3) - math.sqrt(0.26 / 3)) < 1e-12)
    assert(math.abs(r1.getDouble(4) - 1.0 / 3) < 1e-12)
    val r2 = out(1)
    assert(math.abs(r2.getDouble(2) - 0.8) < 1e-12 &&
      r2.getDouble(3) == 0.0 && r2.getDouble(4) == 1.0)
  }

  test("region labels: easy / hard split on confidence, ambiguous wins on variability") {
    // var(ex 1) ~ 0.2858 >= 0.2 -> ambiguous despite conf 0.5
    // ex 2: conf 0.8, var 0 -> easy; ex 3: conf 0.1, var 0 -> hard
    val df = Seq((1L, 0.2), (1L, 0.4), (1L, 0.9), (2L, 0.8), (2L, 0.8),
      (3L, 0.1)).toDF("id", "p")
    val regions = TrainingDynamics.cartography(df, "id", "p")
      .orderBy("id").collect().map(_.getString(5)).toSeq
    assert(regions == Seq("ambiguous", "easy", "hard"))
  }

  test("region boundary sits on the ROUNDED statistic") {
    // constant p = 0.5: conf exactly at the default confSplit -> easy
    val df = Seq((1L, 0.5), (1L, 0.5)).toDF("id", "p")
    val r = TrainingDynamics.cartography(df, "id", "p").head()
    assert(r.getString(5) == "easy" && r.getDouble(3) == 0.0)
  }

  test("NULL probabilities are skipped; all-NULL examples report NULL stats") {
    val df = Seq((1L, Some(0.6)), (1L, None), (2L, None))
      .toDF("id", "p")
    val out = TrainingDynamics.cartography(df, "id", "p")
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 1 &&
      math.abs(out(0).getDouble(2) - 0.6) < 1e-12)
    assert(out(1).getLong(1) == 0 && out(1).isNullAt(2) &&
      out(1).isNullAt(3) && out(1).isNullAt(5))
  }

  test("rhoLossSelect ranks by reducible loss desc, ties by id desc, NULLs skipped") {
    val df = Seq(
      ("a", 1L, 5.0, 1.0),   // reducible 4.0
      ("a", 2L, 5.0, 3.0),   // 2.0
      ("a", 3L, 4.0, 2.0),   // 2.0 (tie -> id 3 outranks id 2)
      ("a", 4L, 1.0, 4.0),   // -3.0
      ("b", 5L, 2.0, 1.0)    // 1.0
    ).toDF("g", "id", "tl", "il")
      .unionByName(Seq(("b", 6L)).toDF("g", "id")
        .withColumn("tl", lit(null).cast("double"))
        .withColumn("il", lit(1.0)))
    val out = TrainingDynamics.rhoLossSelect(df, "id", "tl", "il",
      Seq("g"), k = 3).orderBy("g", "rank").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSeq ==
      Seq(("a", 1, 1L), ("a", 2, 3L), ("a", 3, 2L), ("b", 1, 5L)))
    assert(math.abs(out(0).getDouble(2) - 4.0) < 1e-12)
  }

  test("unimaxAllocation waterfills: small languages cap, large share the rest") {
    // caps (maxEpochs=2): a 20, b 60, c 200, d 400; budget 300
    // sequential: a -> min(20, 300/4=75) = 20 (capped), rem 280
    //             b -> min(60, 280/3)    = 60 (capped), rem 220
    //             c -> min(200, 220/2=110) = 110, d -> 110
    val counts = Seq(("a", 10L), ("b", 30L), ("c", 100L), ("d", 200L))
      .toDF("lang", "n_tokens")
    val out = MixtureOptimization.unimaxAllocation(
      counts, "lang", "n_tokens", budget = 300L, maxEpochs = 2L)
      .orderBy("lang").collect()
    val got = out.map(r => (r.getString(0), r.getLong(2), r.getBoolean(3),
      r.getDouble(4))).toSeq
    assert(got == Seq(("a", 20L, true, 20.0), ("b", 60L, true, 60.0),
      ("c", 200L, false, 110.0), ("d", 400L, false, 110.0)))
    assert(math.abs(out(2).getDouble(5) - 1.1) < 1e-12)   // c epochs
    assert(math.abs(out(3).getDouble(5) - 0.55) < 1e-12)  // d epochs
    // allocations sum to the budget when not everything caps
    assert(math.abs(got.map(_._4).sum - 300.0) < 1e-9)
  }

  test("unimaxAllocation leaves budget unspent when every language caps") {
    val counts = Seq(("a", 10L), ("b", 20L)).toDF("lang", "n_tokens")
    val out = MixtureOptimization.unimaxAllocation(
      counts, "lang", "n_tokens", budget = 1000L, maxEpochs = 2L)
      .orderBy("lang").collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.map(_.getDouble(4)).sum == 60.0)
    // a zero-token language: capped at 0, NULL epochs, never NaN
    val z = MixtureOptimization.unimaxAllocation(
      Seq(("z", 0L), ("a", 10L)).toDF("lang", "n_tokens"),
      "lang", "n_tokens", budget = 5L, maxEpochs = 2L)
      .orderBy("lang").collect()
    assert(z(1).getString(0) == "z" && z(1).getDouble(4) == 0.0 &&
      z(1).isNullAt(5))
  }

  test("confidentLearningFlags: thresholds from class means, opposite-class confidence flags") {
    // labeled 1: p1 = 0.9, 0.7 -> t1 = 0.8
    // labeled 0: p1 = 0.1, 0.3, 0.9 -> p0 = 0.9, 0.7, 0.1 -> t0 = 0.56666->0.5667
    val df = Seq((1L, 1L, 0.9), (2L, 1L, 0.7), (3L, 0L, 0.1),
      (4L, 0L, 0.3), (5L, 0L, 0.9)).toDF("id", "y", "p1")
    val out = TrainingDynamics.confidentLearningFlags(df, "id", "y", "p1")
      .orderBy("id").collect()
    //  id 5 (labeled 0, p1 = 0.9 >= t1 = 0.8) -> suspect, suggested 1
    //  id 2 (labeled 1, p0 = 0.3 < t0) -> clean; id 1 p0 = 0.1 -> clean
    //  id 3/4 (labeled 0, p1 = 0.1/0.3 < 0.8) -> clean
    val suspects = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSeq
    assert(suspects == Seq(5L), s"only the planted error flags: $suspects")
    assert(out(4).getLong(4) == 1L)
    assert(out.filter(!_.getBoolean(3)).forall(_.isNullAt(4)))
  }

  test("confidentLearningFlags: single-class corpus flags nothing as the absent class") {
    val df = Seq((1L, 0L, 0.99), (2L, 0L, 0.98)).toDF("id", "y", "p1")
    // no labeled-1 examples -> t1 NULL -> nothing suspected despite huge p1
    val out = TrainingDynamics.confidentLearningFlags(df, "id", "y", "p1")
      .collect()
    assert(out.forall(!_.getBoolean(3)))
    intercept[Exception] {
      TrainingDynamics.confidentLearningFlags(
        Seq((1L, 2L, 0.5)).toDF("id", "y", "p1"), "id", "y", "p1").collect()
    }
    intercept[Exception] {
      TrainingDynamics.confidentLearningFlags(
        Seq((1L, 1L, 1.5)).toDF("id", "y", "p1"), "id", "y", "p1").collect()
    }
  }

  test("parameter and input guards fail loudly") {
    val df = Seq((1L, 0.5)).toDF("id", "p")
    intercept[IllegalArgumentException] {
      TrainingDynamics.cartography(df, "id", "p", confSplit = 0.0)
    }
    intercept[IllegalArgumentException] {
      TrainingDynamics.rhoLossSelect(
        Seq(("a", 1L, 1.0, 1.0)).toDF("g", "id", "tl", "il"),
        "id", "tl", "il", Seq("g"), k = 0)
    }
    intercept[IllegalArgumentException] {
      MixtureOptimization.unimaxAllocation(
        Seq(("a", 1L)).toDF("lang", "n_tokens"), "lang", "n_tokens",
        budget = 0L, maxEpochs = 2L)
    }
    intercept[Exception] {
      MixtureOptimization.unimaxAllocation(
        Seq(("a", -1L)).toDF("lang", "n_tokens"), "lang", "n_tokens",
        budget = 10L, maxEpochs = 2L).collect()
    }
  }
}
