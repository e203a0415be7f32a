package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.VocabComparison

/** Pins for the Fightin' Words comparison: hand-computed prior/log-odds/z
  * on a tiny two-side corpus, shrinkage direction, NULL-side drop, and
  * guards. */
class VocabComparisonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fightinWords matches the hand-computed Monroe formula") {
    // side A: "x x y", side B: "y y z" -> n_a = n_b = 3, N = 6
    // term x: ya=2 yb=0; y: ya=1 yb=2; z: ya=0 yb=1
    val df = Seq((true, "x x y"), (false, "y y z")).toDF("a", "t")
    val out = VocabComparison.fightinWords(df, col("a"), "t")
      .orderBy("term").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
    def expected(ya: Long, yb: Long): (Double, Double) = {
      val alpha = 1.0 * (ya + yb) / 6.0
      val d = math.log((ya + alpha) / (3.0 + 1.0 - ya - alpha)) -
        math.log((yb + alpha) / (3.0 + 1.0 - yb - alpha))
      (d, d / math.sqrt(1.0 / (ya + alpha) + 1.0 / (yb + alpha)))
    }
    Seq((0, 2L, 0L), (1, 1L, 2L), (2, 0L, 1L)).foreach { case (i, ya, yb) =>
      val (d, z) = expected(ya, yb)
      assert(out(i).getLong(1) == ya && out(i).getLong(2) == yb)
      assert(math.abs(out(i).getDouble(3) - d) < 1e-12, s"delta for row $i")
      assert(math.abs(out(i).getDouble(4) - z) < 1e-12, s"z for row $i")
    }
    // direction: the A-exclusive term leans positive, B-exclusive negative
    assert(out(0).getDouble(3) > 0 && out(2).getDouble(3) < 0)
  }

  test("fightinWords: prior shrinks rare terms, NULL sides drop, guards fire") {
    // same one-sided evidence at different counts: more evidence -> larger |z|
    val df = (Seq.fill(8)((true, "common")) ++ Seq.fill(8)((false, "common")) ++
      Seq.fill(6)((true, "freq")) ++ Seq((true, "rare"))).toDF("a", "t")
    val out = VocabComparison.fightinWords(df, col("a"), "t")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(out("freq") > out("rare") && out("rare") > 0,
      s"z must grow with evidence: $out")
    // NULL side rows contribute nothing
    val withNull = Seq((Some(true), "q"), (None, "q q q q")).toDF("a", "t")
    val n = VocabComparison.fightinWords(withNull, col("a"), "t")
      .where(col("term") === "q").head()
    assert(n.getLong(1) == 1 && n.getLong(2) == 0)
    // 1-token corpus + prior 1 exhausts Monroe's denominator -> NULL, not
    // a divide-by-zero
    assert(n.isNullAt(3) && n.isNullAt(4))
    intercept[IllegalArgumentException] {
      VocabComparison.fightinWords(df, col("a"), "t", priorScale = 0.0)
    }
    intercept[IllegalArgumentException] {
      VocabComparison.fightinWords(df, col("a"), "t", minCount = 0L)
    }
  }
}
