package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LongContext

/** Pins for the needle-in-a-haystack synthesis: exact splice positions at
  * hand-chosen depths (0, mid, end-clamp), id-order assembly, capacity
  * binning, and the needle guard. */
class LongContextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val needle = "NEEDLE-X"

  test("needle splices at the exact depth position; assembly is id-ordered") {
    // 3 docs of 4 tokens each, capacity 100 -> ONE bin of 12 tokens
    val df = Seq((2L, "c1 c2 c3 c4"), (1L, "b1 b2 b3 b4"),
      (0L, "a1 a2 a3 a4")).toDF("id", "text")
    def run(depth: Double) = LongContext.needleHaystacks(
      df, "id", "text", size(split(col("text"), " ")), 100L, needle,
      lit(depth)).head()
    val mid = run(0.5)
    assert(mid.getLong(1) == 3 && mid.getLong(2) == 12 &&
      mid.getLong(3) == 6)
    assert(mid.getString(4) ==
      s"a1 a2 a3 a4 b1 b2 $needle b3 b4 c1 c2 c3 c4",
      "assembly must be id-ordered with the needle after token 6")
    val front = run(0.0)
    assert(front.getLong(3) == 0 && front.getString(4).startsWith(needle + " a1"))
    // depth >= 1 clamps to an end-of-haystack needle
    val end = run(1.5)
    assert(end.getLong(3) == 12 && end.getString(4).endsWith("c4 " + needle))
  }

  test("capacity bins split haystacks; depth evaluates per bin") {
    // 4 docs x 3 tokens, capacity 6 -> bins 0 and 1 with 2 docs each
    val df = (0L to 3L).map(i => (i, s"t${i}a t${i}b t${i}c")).toDF("id", "text")
    val out = LongContext.needleHaystacks(df, "id", "text",
        size(split(col("text"), " ")), 6L, needle,
        pmod(col("bin"), lit(2)).cast("double") / 2.0)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(out.forall(r => r.getLong(1) == 2 && r.getLong(2) == 6))
    // bin 0: depth 0 -> pos 0; bin 1: depth 0.5 -> pos 3
    assert(out(0).getLong(3) == 0 && out(1).getLong(3) == 3)
    intercept[IllegalArgumentException] {
      LongContext.needleHaystacks(df, "id", "text",
        size(split(col("text"), " ")), 6L, "two words", lit(0.5))
    }
  }
}
