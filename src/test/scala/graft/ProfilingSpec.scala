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

  test("profileApprox: ≤5% distinct error vs exact, all other fields identical") {
    val orders = graft.sources.Tables.table(spark, TestSpark.sf0001, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    val exact = rows(Profiling.profile(orders, cols))
    val approx = rows(Profiling.profileApprox(orders, cols))
    exact.zip(approx).foreach { case ((c, nr, nn, nd, mn, mx), (c2, nr2, nn2, nd2, mn2, mx2)) =>
      assert((c, nr, nn, mn, mx) == (c2, nr2, nn2, mn2, mx2),
        s"$c: non-distinct fields must be identical")
      assert(math.abs(nd2 - nd) <= 0.05 * nd,
        s"$c: approx distinct $nd2 vs exact $nd exceeds 5% relative error")
    }
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profiling.profile(Seq((1, 2)).toDF("a", "b"), Nil)
    }
  }
}
