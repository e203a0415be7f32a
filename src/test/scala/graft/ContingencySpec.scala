package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Contingency

class ContingencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Contingency.chi2Independence(rows.toDF("a", "b"), "a", "b")
      .collect().head

  test("hand 2x2 table: chi2 and V against the textbook formula") {
    // o = [[10, 20], [30, 40]]: n=100, margins r=(30,70), c=(40,60)
    // e = [[12,18],[28,42]]; chi2 = 4/12 + 4/18 + 4/28 + 4/42
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val r = run(rows)
    val exp = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(math.abs(r.getAs[Double]("chi2") - exp) < 1e-12)
    assert(math.abs(r.getAs[Double]("cramers_v") - math.sqrt(exp / 100))
      < 1e-12)
  }

  test("independent facets: chi2 exactly 0 on a product table") {
    // counts = rowWeight × colWeight → o = e exactly
    val rows = for {
      (a, ra) <- Seq("r1" -> 2, "r2" -> 3)
      (b, cb) <- Seq("c1" -> 1, "c2" -> 4)
      _ <- 1 to ra * cb
    } yield (a, b)
    val r = run(rows)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-12)
    assert(math.abs(r.getAs[Double]("cramers_v")) < 1e-12)
  }

  test("zero-observed cells contribute their expectation (no-spine identity)") {
    // perfect diagonal 2x2: o = [[5,0],[0,5]] → e all 2.5,
    // chi2 = 4·(2.5²/2.5) = 10 = n; V = sqrt(10/10) = 1
    val rows = Seq.fill(5)(("r1", "c1")) ++ Seq.fill(5)(("r2", "c2"))
    val r = run(rows)
    assert(math.abs(r.getAs[Double]("chi2") - 10.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cramers_v") - 1.0) < 1e-12)
  }

  test("constant facet: dof 0 → NULL chi2 and V, not a division blowup") {
    val r = run(Seq(("r1", "c1"), ("r1", "c2"), ("r1", "c2")))
    assert(r.getAs[Long]("dof") == 0L)
    assert(r.isNullAt(r.fieldIndex("chi2")))
    assert(r.isNullAt(r.fieldIndex("cramers_v")))
  }

  test("non-square table: V = 1 when the larger facet determines the smaller") {
    // 3 rows map deterministically onto 2 columns: chi2 = 12 = n·(min−1)
    // → V = 1 even though the table is 3×2 (V normalizes by min(r,c)−1)
    val rows = Seq.fill(4)(("r1", "c1")) ++ Seq.fill(4)(("r2", "c2")) ++
      Seq.fill(4)(("r3", "c1"))
    val r = run(rows)
    assert(r.getAs[Long]("r") == 3L && r.getAs[Long]("c") == 2L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(math.abs(r.getAs[Double]("chi2") - 12.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("cramers_v") - 1.0) < 1e-12)
  }

  private def runMi(rows: Seq[(String, String)]) =
    Contingency.mutualInformation(rows.toDF("a", "b"), "a", "b")
      .collect().head

  test("mutualInformation: perfect diagonal — mi = h = ln 2, nmi = 1") {
    val r = runMi(Seq.fill(5)(("r1", "c1")) ++ Seq.fill(5)(("r2", "c2")))
    assert(math.abs(r.getAs[Double]("mi") - math.log(2)) < 1e-14)
    assert(math.abs(r.getAs[Double]("h_a") - math.log(2)) < 1e-14)
    assert(math.abs(r.getAs[Double]("h_b") - math.log(2)) < 1e-14)
    assert(math.abs(r.getAs[Double]("nmi") - 1.0) < 1e-14)
  }

  test("mutualInformation: product table — mi exactly 0, each term ln(1)") {
    val rows = for {
      (a, ra) <- Seq("r1" -> 2, "r2" -> 3)
      (b, cb) <- Seq("c1" -> 1, "c2" -> 4)
      _ <- 1 to ra * cb
    } yield (a, b)
    val r = runMi(rows)
    assert(r.getAs[Double]("mi") == 0.0) // bitwise: every cell is ln(1)
    assert(math.abs(r.getAs[Double]("nmi")) < 1e-15)
  }

  test("mutualInformation: hand 2x2 against the p·ln(p/(pq)) fold") {
    // o = [[10,20],[30,40]], n=100
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val r = runMi(rows)
    def term(o: Double, ra: Double, cb: Double) =
      (o / 100) * math.log(o * 100 / (ra * cb))
    val exp = term(10, 30, 40) + term(20, 30, 60) +
      term(30, 70, 40) + term(40, 70, 60)
    assert(math.abs(r.getAs[Double]("mi") - exp) < 1e-14)
    val ha = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert(math.abs(r.getAs[Double]("h_a") - ha) < 1e-14)
    assert(math.abs(r.getAs[Double]("nmi")
      - exp / ((ha + r.getAs[Double]("h_b")) / 2)) < 1e-14)
  }

  test("mutualInformation: constant facet — mi 0, nmi NULL (vacuous)") {
    val r = runMi(Seq(("r1", "c1"), ("r1", "c2")))
    assert(r.getAs[Double]("mi") == 0.0)
    assert(r.getAs[Double]("h_a") == 0.0)
    assert(r.isNullAt(r.fieldIndex("nmi")))
  }

  test("chi2Uniformity: hand counts vs equal expectation") {
    // counts 6, 2, 4 over k=3, n=12 → e=4; chi2 = 4/4 + 4/4 + 0 = 2
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c"))
      .map(Tuple1(_)).toDF("f")
    val r = Contingency.chi2Uniformity(rows, "f").collect().head
    assert(r.getAs[Long]("n") == 12L && r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("dof") == 2L)
    assert(math.abs(r.getAs[Double]("chi2") - 2.0) < 1e-12)
  }

  test("chi2Uniformity: perfectly balanced → exactly 0; single category → NULL") {
    val bal = (Seq.fill(5)("a") ++ Seq.fill(5)("b")).map(Tuple1(_))
      .toDF("f")
    assert(Contingency.chi2Uniformity(bal, "f").collect().head
      .getAs[Double]("chi2") == 0.0)
    val one = Seq.fill(7)("a").map(Tuple1(_)).toDF("f")
    val r = Contingency.chi2Uniformity(one, "f").collect().head
    assert(r.getAs[Long]("dof") == 0L)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("NULL category fails loudly") {
    val bad = Seq((Some("r1"), Some("c1")), (None, Some("c2")))
      .toDF("a", "b")
    val e = intercept[Exception] {
      Contingency.chi2Independence(bad, "a", "b").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
