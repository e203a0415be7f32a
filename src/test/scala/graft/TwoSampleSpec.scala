package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TwoSample

class TwoSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(a: Seq[Double], b: Seq[Double]) =
    (a.map(("A", _)) ++ b.map(("B", _))).toDF("g", "v")

  test("mannWhitneyU: hand example with a tie — U, tie-corrected z") {
    // A = [1,2,3], B = [2,4]; ranks 1, 2.5, 2.5, 4, 5
    // R_A = 1 + 2.5 + 4 = 7.5; U_A = 7.5 − 6 = 1.5
    // (pair count: 3>2 → 1, 2=2 → 0.5, rest 0 → 1.5 ✓)
    // ties: t=2 at value 2 → Σ(t³−t) = 6
    // var = (6/12)·(6 − 6/20) = 2.85; z = (1.5 − 3)/√2.85
    val r = TwoSample.mannWhitneyU(df(Seq(1, 2, 3), Seq(2, 4)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("u_a") == 1.5)
    assert(math.abs(r.getAs[Double]("z") - (-1.5 / math.sqrt(2.85))) < 1e-14)
  }

  test("mannWhitneyU: U_A + U_B = n_a·n_b (the pair-count identity)") {
    val d = df(Seq(1, 3, 3, 7, 9), Seq(2, 3, 8))
    val ua = TwoSample.mannWhitneyU(d, "g", "v", "A", "B")
      .collect().head.getAs[Double]("u_a")
    val ub = TwoSample.mannWhitneyU(d, "g", "v", "B", "A")
      .collect().head.getAs[Double]("u_a")
    assert(ua + ub == 15.0)
  }

  test("mannWhitneyU: all values tied — zero variance, z is NULL") {
    val r = TwoSample.mannWhitneyU(df(Seq(5, 5), Seq(5, 5, 5)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Double]("u_a") == 3.0) // all ties count half: 6/2
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("mannWhitneyU: empty group fails loudly; other groups are ignored") {
    val e = intercept[Exception] {
      TwoSample.mannWhitneyU(df(Seq(1), Seq()), "g", "v", "A", "B").collect()
    }
    assert(e.getMessage.contains("empty sample"))
    // a third group present must not contaminate the test
    val d3 = Seq(("A", 1.0), ("B", 2.0), ("C", 100.0)).toDF("g", "v")
    val r = TwoSample.mannWhitneyU(d3, "g", "v", "A", "B").collect().head
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 1L)
  }

  test("welchT: hand moments — t and Welch-Satterthwaite df") {
    // A = [1,2,3,4]: mean 2.5, var 5/3; B = [2,4,6]: mean 4, var 4
    // se2 = 5/12 + 4/3 = 1.75; t = −1.5/√1.75
    // df = 1.75² / ((5/12)²/3 + (4/3)²/2)
    val r = TwoSample.welchT(df(Seq(1, 2, 3, 4), Seq(2, 4, 6)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a") == 2.5)
    assert(r.getAs[Double]("mean_b") == 4.0)
    assert(math.abs(r.getAs[Double]("t") - (-1.5 / math.sqrt(1.75)))
      < 1e-14)
    val ea = (5.0 / 3) / 4; val eb = 4.0 / 3
    val expDf = math.pow(ea + eb, 2) / (ea * ea / 3 + eb * eb / 2)
    assert(math.abs(r.getAs[Double]("df") - expDf) < 1e-12)
  }

  test("welchT: n < 2 or zero variance → NULL t/df; empty group loud") {
    val r = TwoSample.welchT(df(Seq(1), Seq(2, 3)), "g", "v", "A", "B")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("t")) && r.isNullAt(r.fieldIndex("df")))
    val r2 = TwoSample.welchT(df(Seq(5, 5), Seq(5, 5)), "g", "v", "A", "B")
      .collect().head
    assert(r2.isNullAt(r2.fieldIndex("t")))
    val e = intercept[Exception] {
      TwoSample.welchT(df(Seq(1), Seq()), "g", "v", "A", "B").collect()
    }
    assert(e.getMessage.contains("empty sample"))
  }

  test("permutationTest: separated samples reach the minimal add-one p") {
    val d = (1 to 10).map(i => ("A", 100.0 + i)) ++
      (1 to 10).map(i => ("B", i.toDouble))
    val ids = d.zipWithIndex.map { case ((g, v), i) => (i, g, v) }
      .toDF("id", "g", "v")
    val r = TwoSample.permutationTest(ids, "id", "g", "v", "A", "B", 99)
      .collect().head
    assert(r.getAs[Long]("n_perms") == 99L)
    assert(r.getAs[Double]("obs_diff") == 100.0)
    assert(r.getAs[Double]("p_value") == 0.01) // (0+1)/(99+1)
  }

  test("permutationTest: identical populations give a large p, deterministically") {
    val d = (1 to 30).map(i => ("A", (i % 7).toDouble)) ++
      (1 to 30).map(i => ("B", (i % 7).toDouble))
    val ids = d.zipWithIndex.map { case ((g, v), i) => (i, g, v) }
      .toDF("id", "g", "v")
    def p() = TwoSample.permutationTest(ids, "id", "g", "v", "A", "B", 49)
      .collect().head.getAs[Double]("p_value")
    val p1 = p()
    assert(p1 > 0.1) // obs_diff = 0 here; every permutation ties or exceeds
    assert(p() == p1) // hash-deterministic end to end
  }

  test("permutationTest: empty group and NULL id fail loudly") {
    val e = intercept[Exception] {
      TwoSample.permutationTest(
        Seq((1, "A", 1.0)).toDF("id", "g", "v"),
        "id", "g", "v", "A", "B", 9).collect()
    }
    assert(e.getMessage.contains("empty sample"))
    val bad = Seq((Some(1), "A", 1.0), (None, "B", 2.0))
      .toDF("id", "g", "v")
    val e2 = intercept[Exception] {
      TwoSample.permutationTest(bad, "id", "g", "v", "A", "B", 9).collect()
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("ksTest: hand ECDF gap and leftmost argmax") {
    // A = [1,2,3], B = [2,4]; over values 1..4:
    // |cumA·2 − cumB·3| = 2, 1, 3, 0 → D = 3/6 = 0.5 at v = 3
    val r = TwoSample.ksTest(df(Seq(1, 2, 3), Seq(2, 4)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("d") == 0.5)
    assert(r.getAs[Double]("ks_at") == 3.0)
  }

  test("ksTest: identical samples — d = 0, argmax breaks to the leftmost value") {
    val r = TwoSample.ksTest(df(Seq(1, 2, 9), Seq(1, 2, 9)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Double]("d") == 0.0)
    assert(r.getAs[Double]("ks_at") == 1.0)
  }

  test("ksTest: disjoint supports reach the maximal gap 1") {
    val r = TwoSample.ksTest(df(Seq(1, 2), Seq(10, 20, 30)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Double]("d") == 1.0)
    assert(r.getAs[Double]("ks_at") == 2.0)
  }

  test("ksTest: empty group fails loudly") {
    val e = intercept[Exception] {
      TwoSample.ksTest(df(Seq(), Seq(1)), "g", "v", "A", "B").collect()
    }
    assert(e.getMessage.contains("empty sample"))
  }

  test("kruskalWallis: hand ranks without ties") {
    // A = [1,2], B = [3,4]: R_A = 3, R_B = 7
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4
    val d = df(Seq(1, 2), Seq(3, 4))
    val r = TwoSample.kruskalWallis(d, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("h") - 2.4) < 1e-14)
  }

  test("kruskalWallis: tie correction divides H0 by C") {
    // A = [1,2,2], B = [3]: ranks 1, 2.5, 2.5, 4 → ΣR²/n = 12 + 16
    // H0 = 12/20·28 − 15 = 1.8; C = 1 − 6/60 = 0.9 → H = 2.0
    val d = df(Seq(1, 2, 2), Seq(3))
    val r = TwoSample.kruskalWallis(d, "g", "v").collect().head
    assert(math.abs(r.getAs[Double]("h") - 2.0) < 1e-14)
  }

  test("kruskalWallis at k = 2 equals the squared MWU z (shared tie correction)") {
    val d = df(Seq(1, 3, 3, 7, 9, 2), Seq(2, 3, 8, 5))
    val h = TwoSample.kruskalWallis(d, "g", "v").collect().head
      .getAs[Double]("h")
    val z = TwoSample.mannWhitneyU(d, "g", "v", "A", "B").collect().head
      .getAs[Double]("z")
    assert(math.abs(h - z * z) < 1e-12)
  }

  test("kruskalWallis: three groups, all values tied → NULL; k < 2 loud") {
    val tied = (Seq.fill(2)("A") ++ Seq.fill(2)("B") ++ Seq.fill(2)("C"))
      .map((_, 5.0)).toDF("g", "v")
    val r = TwoSample.kruskalWallis(tied, "g", "v").collect().head
    assert(r.getAs[Long]("k") == 3L)
    assert(r.isNullAt(r.fieldIndex("h")))
    val e = intercept[Exception] {
      TwoSample.kruskalWallis(df(Seq(1, 2), Seq()), "g", "v").collect()
    }
    assert(e.getMessage.contains("at least 2 groups"))
  }

  test("effectSizes: hand U, pooled sd, and the Hedges correction") {
    // A = [1,2,3], B = [2,4] (the MWU fixture): U_A = 1.5
    // δ = 2·1.5/6 − 1 = −0.5
    // SS_a = 14 − 12 = 2; SS_b = 20 − 18 = 2; s_p² = 4/3
    // d = (2 − 3)/√(4/3); g = d·(1 − 3/(4·5 − 9))
    val r = TwoSample.effectSizes(df(Seq(1, 2, 3), Seq(2, 4)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Double]("cliffs_delta") == -0.5)
    val d0 = -1.0 / math.sqrt(4.0 / 3)
    assert(math.abs(r.getAs[Double]("cohens_d") - d0) < 1e-14)
    assert(math.abs(r.getAs[Double]("hedges_g") - d0 * (1 - 3.0 / 11))
      < 1e-14)
  }

  test("effectSizes: δ hits ±1 on disjoint supports, 0 on identical samples") {
    val hi = TwoSample.effectSizes(df(Seq(10, 20), Seq(1, 2)),
      "g", "v", "A", "B").collect().head
    assert(hi.getAs[Double]("cliffs_delta") == 1.0)
    val same = TwoSample.effectSizes(df(Seq(1, 2, 3), Seq(1, 2, 3)),
      "g", "v", "A", "B").collect().head
    assert(same.getAs[Double]("cliffs_delta") == 0.0)
  }

  test("effectSizes: zero pooled variance → NULL d/g, δ still reads") {
    val r = TwoSample.effectSizes(df(Seq(5, 5), Seq(5, 5)),
      "g", "v", "A", "B").collect().head
    assert(r.getAs[Double]("cliffs_delta") == 0.0)
    assert(r.isNullAt(r.fieldIndex("cohens_d")))
    assert(r.isNullAt(r.fieldIndex("hedges_g")))
  }

  test("proportionZ: hand pooled z and the exact counts") {
    // A: 30 of 50; B: 20 of 50 → p̂ = 0.5
    // z = 0.2/√(0.25·(1/50+1/50)) = 0.2/0.1 = 2
    val rows = (Seq.fill(30)(("A", true)) ++ Seq.fill(20)(("A", false)) ++
      Seq.fill(20)(("B", true)) ++ Seq.fill(30)(("B", false)))
      .toDF("g", "ok")
    val r = TwoSample.proportionZ(rows, "g", "ok", "A", "B")
      .collect().head
    assert(r.getAs[Long]("k_a") == 30L && r.getAs[Long]("k_b") == 20L)
    assert(r.getAs[Double]("p_a") == 0.6 && r.getAs[Double]("p_b") == 0.4)
    assert(math.abs(r.getAs[Double]("z") - 2.0) < 1e-12)
  }

  test("proportionZ: unanimous groups → NULL z; NULL flag loud") {
    val rows = (Seq.fill(3)(("A", true)) ++ Seq.fill(3)(("B", true)))
      .toDF("g", "ok")
    val r = TwoSample.proportionZ(rows, "g", "ok", "A", "B")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("z")))
    val bad = Seq(("A", Some(true)), ("B", None)).toDF("g", "ok")
    val e = intercept[Exception] {
      TwoSample.proportionZ(bad, "g", "ok", "A", "B").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("NULL value fails loudly") {
    val bad = Seq(("A", Some(1.0)), ("B", None)).toDF("g", "v")
    val e = intercept[Exception] {
      TwoSample.ksTest(bad, "g", "v", "A", "B").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
