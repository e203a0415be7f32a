package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

/** Pins [[Profiling.corpusReport]] against hand-computed values on a
  * crafted corpus covering duplication, language mix, and the exact
  * quantile interpolation. */
class CorpusReportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(rows: (Long, String, String, String, Long)*)
      : Map[String, Double] =
    Profiling.corpusReport(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"),
        "doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("hand-computed report on a crafted corpus") {
    // 4 docs: token counts 1,2,3,4; docs 1 and 2 are duplicates after
    // normalization (case + whitespace); langs en,en,en,de; sources a,a,b,b
    val m = report(
      (1L, "Hello  World", "en", "a", 10L),
      (2L, "hello world", "en", "a", 11L),
      (3L, "x", "en", "b", 1L),
      (4L, "p q r s", "de", "b", 7L))
    assert(m("n_docs") == 4.0)
    assert(m("total_tokens") == 2 + 2 + 1 + 4)
    assert(m("mean_doc_tokens") == 9.0 / 4)
    assert(m("total_chars") == 29.0)
    assert(m("mean_doc_chars") == 29.0 / 4)
    assert(m("n_langs") == 2.0)
    // norm("Hello  World") == norm("hello world") -> 3 distinct of 4
    assert(m("exact_dup_frac") == 1.0 - 3.0 / 4)
    // sources: a=2, b=2 -> top share 0.5
    assert(m("top_source_share") == 0.5)
    // entropy over en=3, de=1: -(3/4)ln(3/4) - (1/4)ln(1/4)
    val want = -(0.75 * math.log(0.75)) - (0.25 * math.log(0.25))
    assert(math.abs(m("lang_entropy_nats") - want) < 1e-12)
    // token counts sorted: 1,2,2,4; h=(n-1)p: p50 -> h=1.5 -> 2.0;
    // p90 -> h=2.7 -> 2 + 0.7*(4-2) = 3.4
    assert(m("p50_doc_tokens") == 2.0)
    assert(math.abs(m("p90_doc_tokens") - 3.4) < 1e-12)
  }

  test("reportDiff: deltas, ratios, NULL-safe zero-prev, full-outer visibility") {
    val prev = Seq(("a", 2.0), ("b", 0.0), ("gone", 7.0)).toDF("metric", "value")
    val cur = Seq(("a", 3.0), ("b", 5.0), ("new", 1.0)).toDF("metric", "value")
    val out = Profiling.reportDiff(prev, cur)
      .orderBy("metric").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out("a") == ((Some(2.0), Some(3.0), Some(1.0), Some(1.5))))
    // prev 0 -> ratio NULL, never Infinity
    assert(out("b") == ((Some(0.0), Some(5.0), Some(5.0), None)))
    // contract changes surface as NULL-sided rows, not silent drops
    assert(out("gone")._2.isEmpty && out("gone")._1.contains(7.0))
    assert(out("new")._1.isEmpty && out("new")._2.contains(1.0))
  }

  test("NULL lang/source is its own group, never merged with empty string") {
    // NULL lang + "" lang must be TWO groups (SQL GROUP BY semantics — the
    // x87 oracle keeps NULL distinct); merging them would deflate n_langs
    // and skew the entropy and top-source share
    val rows = Seq(
      (1L, "a b", Some("en"), Some("s1"), 3L),
      (2L, "c d", None: Option[String], Some("s1"), 3L),
      (3L, "e f", Some(""), None: Option[String], 3L))
    val m = Profiling.corpusReport(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"),
        "doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_langs") == 3.0, "en, NULL, '' are three language groups")
    // uniform thirds -> entropy ln(3)
    assert(math.abs(m("lang_entropy_nats") - math.log(3.0)) < 1e-12)
    // sources: s1=2, NULL=1 -> top share 2/3
    assert(math.abs(m("top_source_share") - 2.0 / 3) < 1e-12)
  }

  test("single-doc corpus and empty-corpus guard") {
    val m = report((1L, "a b c", "en", "s", 5L))
    assert(m("n_docs") == 1.0 && m("p50_doc_tokens") == 3.0 &&
      m("exact_dup_frac") == 0.0 && m("lang_entropy_nats") == 0.0 &&
      m("top_source_share") == 1.0)
    intercept[IllegalArgumentException] {
      Profiling.corpusReport(
        Seq.empty[(Long, String, String, String, Long)]
          .toDF("doc_id", "text", "lang", "source", "n_chars"),
        "doc_id", "text", "lang", "source", "n_chars")
    }
  }
}
