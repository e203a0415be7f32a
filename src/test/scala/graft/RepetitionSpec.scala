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

  test("topNgramStats: trigram ranking and char fraction exact") {
    val d = docs(
      (1L, "a b c a b c x"),  // trigrams: "a b c"×2 wins over the rest (×1)
      (2L, "p q r"),          // single trigram
      (3L, "p q"))            // < 3 tokens → omitted
    val out = Repetition.topNgramStats(d, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "a b c", 2L, 2.0 * 5 / 13),
      (2L, "p q r", 1L, 5.0 / 5)))
  }

  test("dupNgramCoverage: overlap counted once, zero-dup and short docs") {
    val d = docs(
      // tokens: a b a b a b  → dup bigrams "a b"×3 at pos 0,2,4 and
      // "b a"×2 at pos 1,3 → covered token positions 0..5 (all six),
      // dup_chars = 6, total_chars = length("a b a b a b") = 11
      (1L, "a b a b a b"),
      // no repeated bigram → present with 0.0
      (2L, "u v w x"),
      // < 2 tokens → omitted
      (3L, "solo"))
    val out = Repetition.dupNgramCoverage(d, "doc_id", "text", 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 11L, 6.0 / 11),
      (2L, 0L, 7L, 0.0)))
  }

  test("dupNgramCoverage: n=5 partial coverage with distinct-span union") {
    // tokens: Q1..Q5 appear twice with junk between; the two occurrences of
    // the 5-gram "q1 q2 q3 q4 q5" cover positions 0-4 and 8-12 → covered
    // token chars = 10 tokens × 2 chars = 20. One junk token repeats ("zz")
    // but a repeated UNIGRAM is not a 5-gram — contributes nothing.
    val text = "q1 q2 q3 q4 q5 zz yy zz q1 q2 q3 q4 q5 ww"
    val d = docs((9L, text))
    val out = Repetition.dupNgramCoverage(d, "doc_id", "text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((9L, 20L, text.length.toLong, 20.0 / text.length)))
  }

  test("dupNgramCoverage: partitioning invariance") {
    val rows = (1L to 40L).map(i =>
      (i, if (i % 3 == 0) s"r$i s$i r$i s$i r$i" else s"a$i b$i c$i d$i e$i"))
    val d1 = rows.toDF("doc_id", "text").repartition(1)
    val d7 = rows.toDF("doc_id", "text").repartition(7)
    val a = Repetition.dupNgramCoverage(d1, "doc_id", "text", 2)
      .orderBy("doc_id").collect().toSeq
    val b = Repetition.dupNgramCoverage(d7, "doc_id", "text", 2)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
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
