package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bitext

/** Pins [[Bitext]] margin scoring: the hand-computed ratio margin, the
  * hub-demotion property the margin exists for, and the deterministic
  * best-pick tie-break. */
class BitextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def knn(rows: (Long, Long, Double, Int)*) =
    rows.toDF("query_id", "corpus_id", "score", "rank")

  test("hand-computed ratio margins and best-pair mining") {
    // a1's top-2 in B: b1 at 0.9, b2 at 0.7 → avg(a1) = 0.8
    val ab = knn((1L, 10L, 0.9, 1), (1L, 20L, 0.7, 2))
    // b1's top-2 in A: 0.9, 0.5 → avg 0.7; b2's: 0.7, 0.3 → avg 0.5
    val ba = knn((10L, 1L, 0.9, 1), (10L, 2L, 0.5, 2),
      (20L, 1L, 0.7, 1), (20L, 2L, 0.3, 2))
    val m = Bitext.marginScores(ab, ba)
      .orderBy("b_id").collect()
      .map(r => (r.getLong(1), r.getDouble(3))).toMap
    assert(math.abs(m(10L) - 0.9 / 0.75) < 1e-12)
    assert(math.abs(m(20L) - 0.7 / 0.65) < 1e-12)
    val best = Bitext.minePairs(ab, ba, minMargin = 1.1).collect()
    assert(best.length == 1)
    assert(best.head.getLong(1) == 10L)          // b1 wins on margin
    assert(best.head.getBoolean(4))              // 1.2 >= 1.1
  }

  test("hub demotion: equal cosine, denser neighborhood, lower margin") {
    // b_hub and b_iso both score 0.8 against a1, but b_hub sits in a dense
    // region (avg 0.8) while b_iso is isolated (avg 0.4): the margin must
    // prefer b_iso even though raw cosine ties
    val ab = knn((1L, 100L, 0.8, 1), (1L, 200L, 0.8, 2))
    val ba = knn((100L, 1L, 0.8, 1), (100L, 2L, 0.8, 2),
      (200L, 1L, 0.8, 1), (200L, 2L, 0.0, 2))
    val best = Bitext.minePairs(ab, ba, minMargin = 0.0).collect()
    assert(best.head.getLong(1) == 200L, "the isolated partner must win")
    val m = Bitext.marginScores(ab, ba).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(m(200L) > m(100L))
  }

  test("margin ties break toward the smaller b_id") {
    val ab = knn((1L, 7L, 0.5, 1), (1L, 3L, 0.5, 2))
    val ba = knn((7L, 1L, 0.5, 1), (3L, 1L, 0.5, 1))
    val best = Bitext.minePairs(ab, ba, minMargin = 0.0).collect()
    assert(best.head.getLong(1) == 3L)
  }

  test("a b-side never queried in the reverse search yields no pair (honest inner join)") {
    val ab = knn((1L, 10L, 0.9, 1), (1L, 20L, 0.8, 2))
    val ba = knn((10L, 1L, 0.9, 1)) // 20 never queried back
    val m = Bitext.marginScores(ab, ba).collect()
    assert(m.map(_.getLong(1)).toSet == Set(10L))
  }
}
