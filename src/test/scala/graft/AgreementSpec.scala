package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Agreement

class AgreementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // The textbook 2-rater binary table: 10 items, 6 agreements, both
  // marginals 6y/4n → po = 0.6, pe = 0.52, κ = 0.08/0.48 = 1/6.
  private def twoRaters = Seq(
    (1, 1, "y"), (2, 1, "y"), (3, 1, "y"), (4, 1, "y"), (5, 1, "y"),
    (6, 1, "y"), (7, 1, "n"), (8, 1, "n"), (9, 1, "n"), (10, 1, "n"),
    (1, 2, "y"), (2, 2, "y"), (3, 2, "y"), (4, 2, "y"), (5, 2, "n"),
    (6, 2, "n"), (7, 2, "n"), (8, 2, "n"), (9, 2, "y"), (10, 2, "y")
  ).toDF("item", "rater", "label")

  test("cohenKappaPairs: hand-computed po/pe/kappa on the textbook table") {
    val r = Agreement.cohenKappaPairs(twoRaters, "item", "rater", "label")
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_items") == 10L)
    assert(math.abs(row.getAs[Double]("po") - 0.6) < 1e-15)
    assert(math.abs(row.getAs[Double]("pe") - 0.52) < 1e-15)
    assert(math.abs(row.getAs[Double]("kappa") - 1.0 / 6) < 1e-15)
  }

  test("cohenKappaPairs: perfect agreement is kappa = 1") {
    val df = Seq((1, 1, "a"), (2, 1, "b"), (1, 2, "a"), (2, 2, "b"))
      .toDF("item", "rater", "label")
    val row = Agreement.cohenKappaPairs(df, "item", "rater", "label")
      .collect().head
    assert(row.getAs[Double]("po") == 1.0)
    assert(row.getAs[Double]("kappa") == 1.0)
  }

  test("cohenKappaPairs: both raters constant and equal -> pe = 1, kappa NULL") {
    val df = Seq((1, 1, "a"), (2, 1, "a"), (1, 2, "a"), (2, 2, "a"))
      .toDF("item", "rater", "label")
    val row = Agreement.cohenKappaPairs(df, "item", "rater", "label")
      .collect().head
    assert(row.getAs[Double]("pe") == 1.0)
    assert(row.isNullAt(row.fieldIndex("kappa")))
  }

  test("cohenKappaPairs: pairwise deletion — each pair scored on co-rated items only") {
    // rater 3 rated only items 1-2; pair (1,3) must use n=2, pair (1,2) n=3
    val df = Seq(
      (1, 1, "a"), (2, 1, "a"), (3, 1, "b"),
      (1, 2, "a"), (2, 2, "b"), (3, 2, "b"),
      (1, 3, "a"), (2, 3, "a")
    ).toDF("item", "rater", "label")
    val rows = Agreement.cohenKappaPairs(df, "item", "rater", "label")
      .collect()
    val got = rows
      .map(r => (r.getAs[Int]("rater_a"), r.getAs[Int]("rater_b")) ->
        r.getAs[Long]("n_items")).toMap
    assert(got((1, 2)) == 3L)
    assert(got((1, 3)) == 2L)
    assert(got((2, 3)) == 2L)
    // pair (1,2) by hand: po = 2/3; marginals A 2a/1b, B 1a/2b →
    // pe = (2·1 + 1·2)/9 = 4/9; κ = (2/3 − 4/9)/(5/9) = 0.4
    val p12 = rows.find(r => r.getAs[Int]("rater_a") == 1 &&
      r.getAs[Int]("rater_b") == 2).get
    assert(math.abs(p12.getAs[Double]("po") - 2.0 / 3) < 1e-15)
    assert(math.abs(p12.getAs[Double]("pe") - 4.0 / 9) < 1e-15)
    assert(math.abs(p12.getAs[Double]("kappa") - 0.4) < 1e-15)
  }

  test("cohenKappaPairs: duplicate (item, rater) rating fails loudly") {
    val df = Seq((1, 1, "a"), (1, 1, "b"), (1, 2, "a"))
      .toDF("item", "rater", "label")
    val ex = intercept[Exception] {
      Agreement.cohenKappaPairs(df, "item", "rater", "label").collect()
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("guards: NULL label fails loudly") {
    val df = Seq((1, 1, Some("a")), (2, 1, None), (1, 2, Some("a")),
      (2, 2, Some("a"))).toDF("item", "rater", "label")
    val ex = intercept[Exception] {
      Agreement.cohenKappaPairs(df, "item", "rater", "label").collect()
    }
    assert(ex.getMessage.contains("NULL label"))
  }

  // 3 items × 3 raters: n_ic rows (3,0), (2,1), (0,3)
  // P̄ = (23 − 9)/(3·3·2) = 7/9; p_a = 5/9, p_b = 4/9 → P̄e = 41/81
  // κ = (7/9 − 41/81)/(1 − 41/81) = 22/40 = 0.55
  private def fleissPanel = Seq(
    (1, 1, "a"), (1, 2, "a"), (1, 3, "a"),
    (2, 1, "a"), (2, 2, "a"), (2, 3, "b"),
    (3, 1, "b"), (3, 2, "b"), (3, 3, "b")
  ).toDF("item", "rater", "label")

  test("fleissKappa: hand-computed panel") {
    val row = Agreement.fleissKappa(fleissPanel, "item", "rater", "label")
      .collect().head
    assert(row.getAs[Long]("n_items") == 3L)
    assert(row.getAs[Long]("n_raters") == 3L)
    assert(math.abs(row.getAs[Double]("p_bar") - 7.0 / 9) < 1e-15)
    assert(math.abs(row.getAs[Double]("p_e") - 41.0 / 81) < 1e-15)
    assert(math.abs(row.getAs[Double]("kappa") - 0.55) < 1e-15)
  }

  test("fleissKappa: unanimous panel on a single category -> p_e = 1, kappa NULL") {
    val df = Seq((1, 1, "a"), (1, 2, "a"), (2, 1, "a"), (2, 2, "a"))
      .toDF("item", "rater", "label")
    val row = Agreement.fleissKappa(df, "item", "rater", "label")
      .collect().head
    assert(row.getAs[Double]("p_e") == 1.0)
    assert(row.isNullAt(row.fieldIndex("kappa")))
  }

  test("fleissKappa: ragged panel fails loudly") {
    val df = Seq((1, 1, "a"), (1, 2, "a"), (2, 1, "a"))
      .toDF("item", "rater", "label")
    val ex = intercept[Exception] {
      Agreement.fleissKappa(df, "item", "rater", "label").collect()
    }
    assert(ex.getMessage.contains("ragged"))
  }

  test("fleissKappa matches cohen kappa population on a 2-rater panel (different statistic, same ordering)") {
    // sanity: for the textbook table Fleiss' (= Scott's π for 2 raters)
    // is below Cohen's κ when marginals differ between raters — here the
    // marginals are IDENTICAL (6y/4n both), so π = κ exactly.
    val c = Agreement.cohenKappaPairs(twoRaters, "item", "rater", "label")
      .collect().head.getAs[Double]("kappa")
    val f = Agreement.fleissKappa(twoRaters, "item", "rater", "label")
      .collect().head.getAs[Double]("kappa")
    assert(math.abs(c - f) < 1e-12)
  }
}
