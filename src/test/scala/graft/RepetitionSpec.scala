package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Repetition

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("duplicateSegmentStats: exact fractions on crafted repeated lines") {
    val d = docs(
      // 4 lines: "aa" ×3 (len 2), "bbbb" ×1 → dup instances 2 of 4 lines,
      // dup chars 2·2 of total 3·2+4 = 10
      (1L, "aa\naa\nbbbb\naa"),
      (2L, "x\ny\nz"),           // no repetition
      (3L, "  \n \n"))           // only blank segments → omitted
    val out = Repetition.duplicateSegmentStats(d, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2.0 / 4, 4.0 / 10), (2L, 0.0, 0.0)))
  }

  test("duplicateSegmentStats: sentence delimiter, whitespace-insensitive trim") {
    val d = docs((7L, "Hello there. hello there.  Hello there. Bye."))
    // trimmed case-SENSITIVE segments: "Hello there"×2, "hello there", "Bye"
    val out = Repetition.duplicateSegmentStats(d, "doc_id", "text",
        delimRegex = "[.!?]+")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val totalChars = 11 * 3 + 3 // three 11-char segments + "Bye"
    assert(out.toSeq == Seq((7L, 1.0 / 4, 11.0 / totalChars)))
  }

  test("topBigramStats: count, tie-break, and char fraction exact") {
    val d = docs(
      (1L, "a b a b a"),   // bigrams: "a b"×2, "b a"×2 → tie → "a b" wins
      (2L, "one token"),   // single bigram
      (3L, "solo"))        // < 2 tokens → omitted
    val out = Repetition.topBigramStats(d, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "a b", 2L, 2.0 * 3 / 9),
      (2L, "one token", 1L, 9.0 / 9)))
  }
}
