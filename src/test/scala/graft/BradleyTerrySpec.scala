package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BradleyTerry

class BradleyTerrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strengths(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r =>
      r.getAs[String]("item") -> r.getAs[Double]("strength")).toMap

  test("fit: two items reach the closed-form fixed point in one MM step") {
    // A beats B twice, B beats A once; smoothed: n' = 4, W_A = 2.5,
    // W_B = 1.5. Under Σw = 2 normalization, w_A + w_B = 2 always, so
    // w_A = 2.5·2/4 = 1.25, w_B = 0.75 — the exact fixed point; any
    // iteration count must land there, and P(A>B) = 1.25/2 = the
    // smoothed win rate 2.5/4.
    val m = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val got = strengths(BradleyTerry.fit(m, "w", "l", iters = 7))
    assert(math.abs(got("A") - 1.25) < 1e-12)
    assert(math.abs(got("B") - 0.75) < 1e-12)
  }

  test("fit: raw counts exclude smoothing") {
    val m = Seq(("A", "B"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val row = BradleyTerry.fit(m, "w", "l", iters = 3)
      .where($"item" === "A").collect().head
    assert(row.getAs[Long]("n_games") == 3L)
    assert(row.getAs[Long]("n_wins") == 2L)
  }

  test("fit: a balanced round-robin is flat at strength 1") {
    val m = Seq(("A", "B"), ("B", "A"), ("B", "C"), ("C", "B"),
      ("A", "C"), ("C", "A")).toDF("w", "l")
    val got = strengths(BradleyTerry.fit(m, "w", "l", iters = 10))
    got.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12, got))
  }

  test("fit: strengths order by dominance and sum to K") {
    // A sweeps everyone, B beats C, chain A > B > C
    val m = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("A", "C"),
      ("B", "C"), ("B", "C"), ("C", "B")).toDF("w", "l")
    val fitted = BradleyTerry.fit(m, "w", "l", iters = 30)
    val got = strengths(fitted)
    assert(got("A") > got("B") && got("B") > got("C"), got)
    assert(math.abs(got.values.sum - 3.0) < 1e-9)
  }

  test("fit: strength-of-schedule matters — a win over the champion outranks a win over the doormat") {
    // D1 and D2 have identical 1-1 records, but D1's win came against
    // strong S (who sweeps everyone else) while D2's came against weak W
    // (who loses everything else). BT must rank D1 above D2; a naive
    // win-rate table cannot separate them.
    val m = Seq(
      ("S", "W"), ("S", "W"), ("S", "W"),
      ("D1", "S"), ("S", "D1"),
      ("D2", "W"), ("W", "D2")
    ).toDF("w", "l")
    val got = strengths(BradleyTerry.fit(m, "w", "l", iters = 40))
    assert(got("D1") > got("D2"),
      s"win over champion must outrank win over doormat: $got")
  }

  test("fit: reproducible across input partitioning at 1e-9") {
    val rows = (1 to 400).map { i =>
      val a = s"s${i % 7}"; val b = s"s${(i * 3 + 1) % 7}"
      if (a != b) Some(if (i % 3 == 0) (a, b) else (b, a)) else None
    }.flatten
    val m1 = rows.toDF("w", "l")
    val m2 = rows.toDF("w", "l").repartition(13)
    val g1 = strengths(BradleyTerry.fit(m1, "w", "l", iters = 15))
    val g2 = strengths(BradleyTerry.fit(m2, "w", "l", iters = 15))
    g1.foreach { case (k, v) => assert(math.abs(v - g2(k)) < 1e-9, k) }
  }

  test("fit: NULL endpoint and self-match fail loudly") {
    val nullm = Seq((Some("A"), None), (Some("A"), Some("B")))
      .toDF("w", "l")
    val ex1 = intercept[Exception] {
      BradleyTerry.fit(nullm, "w", "l", iters = 1).collect()
    }
    assert(ex1.getMessage.contains("NULL match endpoint"))
    val selfm = Seq(("A", "A"), ("A", "B")).toDF("w", "l")
    val ex2 = intercept[Exception] {
      BradleyTerry.fit(selfm, "w", "l", iters = 1).collect()
    }
    assert(ex2.getMessage.contains("self-match"))
  }

  test("fit: single observed pair still works (smoothing keeps both finite)") {
    val m = Seq(("A", "B")).toDF("w", "l")
    val got = strengths(BradleyTerry.fit(m, "w", "l", iters = 25))
    // smoothed 1.5 vs 0.5 wins on 2 games: fixed point 1.5, 0.5
    assert(math.abs(got("A") - 1.5) < 1e-12, got)
    assert(math.abs(got("B") - 0.5) < 1e-12, got)
  }
}
