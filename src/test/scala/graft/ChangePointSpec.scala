package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ChangePoint

class ChangePointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(xs: Seq[Double], target: Double, k: Double, h: Double)
      : Seq[(Double, Double, Boolean, Boolean)] =
    ChangePoint.cusum(
        xs.zipWithIndex.map { case (x, i) => ("a", i, x) }
          .toDF("key", "i", "x"),
        "key", "i", "x", lit(target), lit(k), lit(h))
      .orderBy("i")
      .select("cusum_up", "cusum_dn", "alarm_up", "alarm_dn")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1),
        r.getBoolean(2), r.getBoolean(3)))
      .toSeq

  /** The textbook recursion the closed form must replay. */
  private def recursion(xs: Seq[Double], target: Double, k: Double)
      : (Seq[Double], Seq[Double]) = {
    val up = xs.scanLeft(0.0)((s, x) => math.max(0.0, s + (x - target - k)))
    val dn = xs.scanLeft(0.0)((s, x) => math.max(0.0, s + (target - x - k)))
    (up.tail, dn.tail)
  }

  test("hand series: both sides and both alarm faces fire where expected") {
    val got = run(Seq(10, 10, 14, 14, 10, 2), target = 10, k = 1, h = 3)
    assert(got.map(_._1) == Seq(0.0, 0.0, 3.0, 6.0, 5.0, 0.0))
    assert(got.map(_._2) == Seq(0.0, 0.0, 0.0, 0.0, 0.0, 7.0))
    assert(got.map(_._3) == Seq(false, false, false, true, true, false))
    assert(got.map(_._4) == Seq(false, false, false, false, false, true))
  }

  test("closed form == Page's recursion on a deterministic pseudo-random series") {
    val xs = (1 to 60).map(i => ((i * 2654435761L) % 21).toDouble)
    val (expUp, expDn) = recursion(xs, target = 10, k = 1)
    val got = run(xs, target = 10, k = 1, h = 5)
    assert(got.map(_._1) == expUp)
    assert(got.map(_._2) == expDn)
    assert(got.map(_._3) == expUp.map(_ > 5.0))
    assert(got.map(_._4) == expDn.map(_ > 5.0))
  }

  test("keys are independent: a drift in one key never leaks into another") {
    val df = ((1 to 5).map(i => ("calm", i, 10.0))
      ++ (1 to 5).map(i => ("hot", i, 20.0))).toDF("key", "i", "x")
    val got = ChangePoint.cusum(df, "key", "i", "x",
        lit(10.0), lit(1.0), lit(4.0))
      .groupBy("key").agg(max("cusum_up").as("mx"),
        max(col("alarm_up").cast("int")).as("al"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2)))
      .toMap
    assert(got("calm") == (0.0, 0))
    assert(got("hot") == (45.0, 1)) // 5 steps of +9
  }

  test("per-key target/allowance columns resolve per row") {
    val df = Seq(("a", 1, 10.0, 5.0), ("a", 2, 10.0, 5.0),
                 ("b", 1, 10.0, 9.0), ("b", 2, 10.0, 9.0))
      .toDF("key", "i", "x", "tgt")
    val got = ChangePoint.cusum(df, "key", "i", "x",
        col("tgt"), lit(1.0), lit(100.0))
      .groupBy("key").agg(max("cusum_up").as("mx")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") == 8.0) // (10-5-1)·2
    assert(got("b") == 0.0) // 10-9-1 = 0 per step
  }

  test("NULL value and NULL order fail loudly") {
    val bad1 = Seq(("a", Some(1), Some(10.0)), ("a", Some(2), None))
      .toDF("key", "i", "x")
    val e1 = intercept[Exception] {
      ChangePoint.cusum(bad1, "key", "i", "x", lit(1.0), lit(0.0), lit(1.0))
        .collect()
    }
    assert(e1.getMessage.contains("NULL value"))
    val bad2 = Seq(("a", Some(1), Some(10.0)), ("a", None, Some(9.0)))
      .toDF("key", "i", "x")
    val e2 = intercept[Exception] {
      ChangePoint.cusum(bad2, "key", "i", "x", lit(1.0), lit(0.0), lit(1.0))
        .collect()
    }
    assert(e2.getMessage.contains("NULL order"))
  }
}
