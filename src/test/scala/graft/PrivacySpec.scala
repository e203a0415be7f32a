package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Privacy

/** Pins for the k-anonymity screens: suppression keeps exactly the rows in
  * cohorts ≥ k, the report surfaces the risky cohorts first, the retention
  * curve matches hand arithmetic, NULLs cohort together. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    // (lang, source): cohort sizes en/a=3, en/b=1, de/a=2, NULL/a=2
    (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
    (4L, "en", "b"),
    (5L, "de", "a"), (6L, "de", "a"),
    (7L, null, "a"), (8L, null, "a"))
    .toDF("id", "lang", "src").repartition(3)

  test("suppression keeps exactly the rows whose cohort reaches k") {
    val kept = Privacy.suppressRareCombinations(fixture, Seq("lang", "src"), 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L, 6L, 7L, 8L), s"got $kept")
    val strict = Privacy.suppressRareCombinations(fixture, Seq("lang", "src"), 3)
      .select("id").as[Long].collect().toSet
    assert(strict == Set(1L, 2L, 3L))
    // k=1 is the identity
    assert(Privacy.suppressRareCombinations(fixture, Seq("lang", "src"), 1)
      .count() == 8)
  }

  test("NULL quasi-identifiers form their own cohort") {
    val kept = Privacy.suppressRareCombinations(fixture, Seq("lang"), 2)
      .select("id").as[Long].collect().toSet
    assert(kept.contains(7L) && kept.contains(8L),
      "two NULL-lang rows are a size-2 cohort and must survive k=2")
  }

  test("cohort report: risky cohorts first, correct flags") {
    val rep = Privacy.cohortReport(fixture, Seq("lang", "src"), 2)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("src"),
        r.getAs[Long]("cohort_n"), r.getAs[Boolean]("anonymous")))
    assert(rep.head._3 == 1 && !rep.head._4, "smallest cohort must lead")
    assert(rep.map(_._3).toSeq == rep.map(_._3).toSeq.sorted)
    assert(rep.count(!_._4) == 1)
  }

  test("retention curve matches hand arithmetic") {
    val row = Privacy.retentionCurve(fixture, Seq("lang", "src"), Seq(1L, 2L, 3L, 9L))
      .head()
    assert(row.getDouble(0) == 1.0)            // k=1: everything
    assert(row.getDouble(1) == 7.0 / 8.0)      // k=2: drop en/b
    assert(row.getDouble(2) == 3.0 / 8.0)      // k=3: only en/a
    assert(row.getDouble(3) == 0.0)            // k=9: nothing survives
  }

  test("guards: empty columns and k < 1 throw") {
    intercept[IllegalArgumentException](
      Privacy.suppressRareCombinations(fixture, Seq.empty, 2))
    intercept[IllegalArgumentException](
      Privacy.cohortReport(fixture, Seq("lang"), 0))
    intercept[IllegalArgumentException](
      Privacy.retentionCurve(fixture, Seq("lang"), Seq(0L)))
  }
}
