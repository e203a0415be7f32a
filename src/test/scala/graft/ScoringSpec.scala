package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Scoring

class ScoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val feats = Seq(
    (1L, 10.0, 0.9), (2L, 100.0, 0.2), (3L, 50.0, 0.5))
    .toDF("id", "f1", "f2")

  test("applyLinearModel: exact fixed-order margin and threshold decision") {
    val out = Scoring.applyLinearModel(feats,
        Seq("f1" -> 0.1, "f2" -> 2.0), bias = -3.0)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getBoolean(4)))
    // left-to-right: ((-3.0 + f1*0.1) + f2*2.0)
    assert(out(0) == ((1L, ((-3.0 + 10.0 * 0.1) + 0.9 * 2.0), false)))
    assert(out(1) == ((2L, ((-3.0 + 100.0 * 0.1) + 0.2 * 2.0), true)))
    assert(out(2) == ((3L, ((-3.0 + 50.0 * 0.1) + 0.5 * 2.0), true)))
  }

  test("inference is map-only: no Exchange in the scored plan") {
    val plan = Scoring.applyLinearModel(feats,
        Seq("f1" -> 0.1, "f2" -> 2.0), bias = -3.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("custom threshold and column names") {
    val out = Scoring.applyLinearModel(feats, Seq("f1" -> 1.0), bias = 0.0,
        threshold = 40.0, scoreCol = "s", keepCol = "k")
    assert(out.columns.takeRight(2).toSeq == Seq("s", "k"))
    assert(out.where(col("k")).select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 3L))
  }
}
