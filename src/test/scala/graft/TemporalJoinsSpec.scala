package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin}

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("asof backward: latest at-or-before match per key; no match → null") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 50L))
      .toDF("event_id", "k", "t")
    val right = Seq(("a", 10L, 1.0), ("a", 15L, 2.0), ("b", 60L, 3.0))
      .toDF("k", "t", "v")
    val got = AsofJoin.backward(left, right, "k", "t", "t", Map("v" -> "last_v"))
      .select("event_id", "last_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == 1.0) // equal ts is inclusive
    assert(got(2L) == 2.0) // latest of the two priors
    assert(got(3L) == null) // before any right row
    assert(got(4L) == null) // right row is in the future
  }

  test("asof backward: left payload columns survive intact") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L, "keep")).toDF("id", "k", "t", "payload")
    val right = Seq(("a", 9L, 7.0)).toDF("k", "t", "v")
    val row = AsofJoin.backward(left, right, "k", "t", "t", Map("v" -> "w")).head()
    assert(row.getAs[String]("payload") == "keep" && row.getAs[Double]("w") == 7.0)
  }

  test("binned range join == naive BETWEEN join on testdata (several bin widths)") {
    val li = graft.sources.Tables.table(spark, TestSpark.sf0001, "lineitem")
    val or = graft.sources.Tables.table(spark, TestSpark.sf0001, "orders")
    val pts = li.select(unix_date(col("l_shipdate").cast("date")).as("__p"))
    val ivs = or.where(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), unix_date(col("o_orderdate").cast("date")).as("__lo"))
      .withColumn("__hi", col("__lo") + 7)
    val naive = pts.join(ivs, col("__p").between(col("__lo"), col("__hi")))
      .groupBy("o_orderkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (w <- Seq(3L, 8L, 100L)) {
      val binned = RangeJoin.pointInInterval(pts, "__p", ivs, "__lo", "__hi", w)
        .groupBy("o_orderkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(binned == naive, s"binWidth=$w")
    }
    assert(naive.nonEmpty)
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val li = graft.sources.Tables.table(spark, TestSpark.sf0001, "lineitem")
    val or = graft.sources.Tables.table(spark, TestSpark.sf0001, "orders")
    val pts = li.select(unix_date(col("l_shipdate").cast("date")).as("__p"))
    val ivs = or.select(col("o_orderkey"),
        unix_date(col("o_orderdate").cast("date")).as("__lo"))
      .withColumn("__hi", col("__lo") + 7)
    val plan = RangeJoin.pointInInterval(pts, "__p", ivs, "__lo", "__hi", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested loop in plan:\n$plan")
    val naivePlan = pts.join(ivs, col("__p").between(col("__lo"), col("__hi")))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"))
  }
}
