package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ablation

/** Pins for leave-one-group-out ablation: hand-computed deltas, NULL
  * metric/group semantics, the single-group degenerate case. */
class AblationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("deltas match hand computation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "m")
    val out = Ablation.leaveOneOut(df, "g", "m").orderBy("g").collect()
    val a = out(0); val b = out(1)
    assert(a.getString(0) == "a" && a.getLong(1) == 2)
    assert(math.abs(a.getDouble(2) - 1.5) < 1e-12)       // mean_in
    assert(math.abs(a.getDouble(3) - 2.0) < 1e-12)       // mean_all
    assert(math.abs(a.getDouble(4) - 3.0) < 1e-12)       // mean_without
    assert(math.abs(a.getDouble(5) - (-1.0)) < 1e-12)    // delta: a pulls DOWN
    assert(math.abs(b.getDouble(4) - 1.5) < 1e-12)
    assert(math.abs(b.getDouble(5) - 0.5) < 1e-12)       // b pulls UP
  }

  test("NULL metrics are excluded from counts; NULL group keys surface as a row") {
    val df = Seq((Some("a"), Some(1.0)), (Some("a"), None),
      (None, Some(5.0))).toDF("g", "m")
    val out = Ablation.leaveOneOut(df, "g", "m").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out == Map(Some("a") -> 1L, None -> 1L))
  }

  test("a group holding every metric row gets NULL mean_without/delta") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", Double.NaN)).toDF("g", "m")
      .where(col("g") === "a")
    val out = Ablation.leaveOneOut(df, "g", "m").collect()
    assert(out.length == 1 && out.head.isNullAt(4) && out.head.isNullAt(5))
  }

  test("an all-NULL-metric group reports mean_without = mean_all, delta = 0") {
    // the group contributes nothing to the sum — removing it changes
    // nothing; its NULL sum must be coalesced, never propagated
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
      ("b", None: Option[Double])).toDF("g", "m")
    val out = Ablation.leaveOneOut(df, "g", "m").orderBy("g").collect()
    val b = out(1)
    assert(b.getString(0) == "b" && b.getLong(1) == 0)
    assert(b.isNullAt(2))                                // mean_in: no rows
    assert(math.abs(b.getDouble(3) - 2.0) < 1e-12)       // mean_all
    assert(b.getDouble(4) == 2.0, "mean_without must equal mean_all")
    assert(b.getDouble(5) == 0.0, "delta must be exactly 0")
  }
}
