package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: nulls, exact distincts, min/max per column in one pass") {
    val df = Seq(
      (Some(1), Some("b")), (Some(2), None), (Some(2), Some("a")),
      (None, Some("a")))
      .toDF("k", "v")
    val out = Profiling.profile(df, Seq("k", "v"))
      .orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("v", 4L, 1L, 2L, "a", "b")))
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profiling.profile(Seq((1, 2)).toDF("a", "b"), Nil)
    }
  }
}
