package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SubstringDedup

class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // doc 1 and doc 2 share the 7-token run "a b c d e f g" → with k=5 the
  // duplicated window starts are p ∈ {0,1,2} in doc 1 (offset 2 in doc 2),
  // merging into one span of 7 tokens; the tails differ.
  private val planted = docs(
    (1L, "a b c d e f g tail1 tail2 tail3"),
    (2L, "pre1 pre2 a b c d e f g other"),
    (3L, "nothing shared with anyone at all here"))

  test("duplicatedSpans: planted cross-document repeat, exact span bounds") {
    val out = SubstringDedup.duplicatedSpans(planted, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L, 7L, 3L), (2L, 2L, 9L, 3L)))
  }

  test("duplicatedSpans: within-document repeat counts as duplication") {
    // the 5-gram "x x x x x" occurs at starts 0..3 of one document
    val out = SubstringDedup.duplicatedSpans(
        docs((9L, "x x x x x x x x")), "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((9L, 0L, 8L, 4L)))
  }

  test("duplicatedSpans: islands more than k apart stay separate spans") {
    val d = docs(
      (1L, "s1 s2 s3 s4 s5 gapA gapB gapC gapD gapE gapF t1 t2 t3 t4 t5"),
      (2L, "s1 s2 s3 s4 s5 other words here now t1 t2 t3 t4 t5"))
    val out = SubstringDedup.duplicatedSpans(d, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 0L, 5L), (1L, 11L, 16L), (2L, 0L, 5L), (2L, 9L, 14L)))
  }

  test("exactGrams parity: literal-text keys reproduce the hashed result") {
    val corpus = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
    val hashed = SubstringDedup.duplicatedSpans(corpus, "doc_id", "text", k = 5)
      .orderBy("doc_id", "span_start").collect().toSeq
    val exact = SubstringDedup.duplicatedSpans(corpus, "doc_id", "text", k = 5,
        exactGrams = true)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(hashed.nonEmpty, "fixture corpus should contain duplicated 5-grams")
    assert(hashed == exact)
  }

  test("duplicateCoverage: every document appears; spans never double-count") {
    val out = SubstringDedup.duplicateCoverage(planted, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 7L, 0.7), (2L, 10L, 7L, 0.7), (3L, 7L, 0L, 0.0)))
  }

  test("removeDuplicatedSpans keepFirst: earliest copy survives, later copies are cut") {
    val out = SubstringDedup
      .removeDuplicatedSpans(planted, "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      // doc 1 holds the first occurrence of every shared gram → untouched
      (1L, "a b c d e f g tail1 tail2 tail3", 10L, 0L),
      // doc 2's copy of the 7-token run [2, 9) is redundant → removed
      (2L, "pre1 pre2 other", 10L, 7L),
      (3L, "nothing shared with anyone at all here", 7L, 0L)))
  }

  test("removeDuplicatedSpans keepFirst=false: boilerplate removed from every copy") {
    val out = SubstringDedup
      .removeDuplicatedSpans(planted, "doc_id", "text", k = 5, keepFirst = false)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "tail1 tail2 tail3", 7L),
      (2L, "pre1 pre2 other", 7L),
      (3L, "nothing shared with anyone at all here", 0L)))
  }

  test("removeDuplicatedSpans: within-document repeat keeps only the first window") {
    // "x x x x x" at starts 0..3; start 0 is the first occurrence, so its
    // k tokens survive and the redundant starts 1..3 cover [1, 8)
    val out = SubstringDedup
      .removeDuplicatedSpans(docs((9L, "x x x x x x x x")), "doc_id", "text", k = 5)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("x", 8L, 7L)))
  }

  test("removeDuplicatedSpans: short and empty docs pass through unchanged") {
    val out = SubstringDedup
      .removeDuplicatedSpans(docs((1L, "a b c"), (2L, "")), "doc_id", "text", k = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a b c", 3L, 0L), (2L, "", 0L, 0L)))
  }

  test("plan: removal's first-occurrence pick rides the count aggregate, no gram window") {
    // the (count, min-struct) pair must come from ONE map-side-partial hash
    // aggregate; a ROW_NUMBER over the gram key would serialize hot grams
    val plan = SubstringDedup
      .removeDuplicatedSpans(planted, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(__g"),
      "first-occurrence pick must not be a window over the gram key")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"gram stats must partial-aggregate map-side:\n$plan")
  }

  test("plan: duplicate-gram count is a hash aggregate, not a gram window") {
    // the ADVICE-flagged spelling put count(...) over Window.partitionBy(__g):
    // zero partial aggregation, one WindowExec task per hot gram. Pin the
    // fixed shape — no window specification keyed on the gram column, and a
    // left-semi join marking surviving positions.
    val plan = SubstringDedup.duplicatedSpans(planted, "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(__g"),
      "gram duplicate count must not be a window over the gram key")
    assert(plan.contains("LeftSemi"), "positions must semi-join the duplicated-gram set")
  }
}
