package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Preferences

/** Pins preference-pair construction: hand-traced pairs for both policies,
  * deterministic tie direction, NULL-score exclusion, the margin filter,
  * and the single-shuffle plan shape. */
class PreferencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cands = Seq(
    // prompt p: clear ranking 10 > 7 > 7 > 2 (tie at 7 broken by id)
    ("p", 1L, Some(10.0)), ("p", 2L, Some(7.0)), ("p", 3L, Some(7.0)),
    ("p", 4L, Some(2.0)),
    // prompt q: singleton — no pairs
    ("q", 5L, Some(9.0)),
    // prompt r: NULL score dropped; the remaining two pair up
    ("r", 6L, Some(4.0)), ("r", 7L, None), ("r", 8L, Some(1.0)))
    .toDF("prompt", "cid", "score")
    .select(col("prompt"), col("cid"), col("score").cast("double").as("score"))
    .repartition(4)

  test("bestVsRest: winner against all, margin-filtered, ties by id") {
    val got = Preferences.bestVsRest(cands, "prompt", "cid", col("score"))
      .orderBy("prompt", "rejected_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("p", 1L, 2L, 3.0), ("p", 1L, 3L, 3.0), ("p", 1L, 4L, 8.0),
      ("r", 6L, 8L, 3.0)))
    // margin filter drops the 3.0-margin pairs
    val tight = Preferences.bestVsRest(cands, "prompt", "cid", col("score"),
        minMargin = 5.0)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(tight == Seq(("p", 4L)))
  }

  test("adjacentPairs: consecutive ranks only; zero-margin tie pairs " +
    "kept at minMargin 0 with id-deterministic direction") {
    val got = Preferences.adjacentPairs(cands, "prompt", "cid", col("score"))
      .orderBy("prompt", "rejected_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("p", 1L, 2L, 3.0), ("p", 2L, 3L, 0.0), ("p", 3L, 4L, 5.0),
      ("r", 6L, 8L, 3.0)),
      "the 7-vs-7 tie must pair lower id as chosen, margin 0")
    val margin = Preferences.adjacentPairs(cands, "prompt", "cid",
        col("score"), minMargin = 1.0)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(margin == Seq((1L, 2L), (3L, 4L), (6L, 8L)))
  }

  test("rewardModelTrainingFrame: symmetrized diffs; duplicate feats fail loud") {
    val feats = Seq((1L, 4.0, 1.0), (2L, 2.0, 3.0), (3L, 1.0, 0.0))
      .toDF("cid", "x1", "x2")
    val pairs = Seq(("p", 1L, 2L), ("p", 1L, 3L))
      .toDF("prompt", "chosen_id", "rejected_id")
    val frame = Preferences.rewardModelTrainingFrame(
      pairs, feats, "cid", Seq("x1", "x2"))
    val rows = frame.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    // (1,2): Δ=(2,-2); (1,3): Δ=(3,1); each symmetrized
    assert(rows == Seq((-3.0, -1.0, 0.0), (-2.0, 2.0, 0.0),
      (2.0, -2.0, 1.0), (3.0, 1.0, 1.0)))
    val dup = feats.union(feats)
    val e = intercept[IllegalArgumentException] {
      Preferences.rewardModelTrainingFrame(pairs, dup, "cid", Seq("x1"))
    }
    assert(e.getMessage.contains("unique"))
  }

  test("Bradley-Terry fit recovers a separable preference rule exactly") {
    // true score = 2*x1 - x2; pairs from bestVsRest on that score — the
    // fitted reward model must reproduce EVERY pairwise ordering, and the
    // symmetrized objective must keep the bias at ~0
    val feats = (1L to 60L).map { i =>
      val x1 = (i % 7).toDouble; val x2 = (i % 5).toDouble
      (s"g${i % 6}", i, x1, x2, 2 * x1 - x2)
    }.toDF("grp", "cid", "x1", "x2", "score").repartition(4)
    val pairs = Preferences.bestVsRest(feats, "grp", "cid", col("score"),
      minMargin = 0.5)
    val frame = Preferences.rewardModelTrainingFrame(
      pairs, feats.select("cid", "x1", "x2"), "cid", Seq("x1", "x2"))
    val m = graft.operators.LogisticRegression.train(
      frame, Seq("d_x1", "d_x2"), "y", iters = 40)
    assert(math.abs(m.bias) < 1e-6, s"symmetry must pin the bias: ${m.bias}")
    val wMap = m.weights.toMap
    val scored = feats.select(col("cid"),
      (lit(wMap("d_x1")) * col("x1") + lit(wMap("d_x2")) * col("x2")).as("r"))
    val acc = pairs
      .join(scored.select(col("cid").as("chosen_id"), col("r").as("rc")), "chosen_id")
      .join(scored.select(col("cid").as("rejected_id"), col("r").as("rr")), "rejected_id")
      .select(avg(when(col("rc") > col("rr"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc == 1.0, s"separable rule must be fully recovered, got $acc")
  }

  test("single shuffle: both policies stay inside the ranking window") {
    Seq(
      Preferences.bestVsRest(cands, "prompt", "cid", col("score")),
      Preferences.adjacentPairs(cands, "prompt", "cid", col("score"))
    ).foreach { out =>
      val plan = out.queryExecution.executedPlan.toString
      val keyExchanges = "hashpartitioning\\(prompt".r.findAllIn(plan).size
      assert(keyExchanges <= 1, s"policy added a shuffle:\n$plan")
      assert(!plan.contains("Join"), s"no self-join allowed:\n$plan")
    }
  }
}
