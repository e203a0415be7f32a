package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Selection

/** Bounded-heap top-k per group ([[Selection.topKPerGroup]] over the native
  * `graft_topk` TypedImperativeAggregate): must return exactly the
  * ROW_NUMBER-window rows with k-bounded partial state instead of a
  * per-group history sort. */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The window spelling the aggregate must match row-for-row. */
  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy($"score".desc, $"id".desc)
    df.withColumn("rank", row_number().over(w)).where($"rank" <= k)
      .select($"g", $"rank", $"score", $"id")
  }

  // deterministic pseudo-random fixture with a hot group: group "hot" has
  // 200 rows, the others 3 each — the shape where the window sort hurts
  private def fixture = {
    val hot = (0 until 200).map(i => ("hot", ((i * 37) % 101).toDouble, i.toLong))
    val cold = for (g <- 'a' to 'e'; i <- 0 until 3)
      yield (g.toString, ((i * 7 + g) % 13).toDouble, 1000L + g * 10 + i)
    (hot ++ cold).toDF("g", "score", "id")
  }

  test("matches the ROW_NUMBER window spelling, partitioning-invariant") {
    val expected = windowTopK(fixture, 5).collect().toSet
    Seq(1, 7, 32).foreach { p =>
      val got = Selection.topKPerGroup(fixture.repartition(p), Seq("g"), "score", "id", 5)
        .collect().toSet
      assert(got == expected, s"partitions=$p")
    }
  }

  test("ties on score break toward the larger id") {
    val df = Seq(("g", 1.0, 1L), ("g", 1.0, 3L), ("g", 1.0, 2L)).toDF("g", "score", "id")
    val got = Selection.topKPerGroup(df, Seq("g"), "score", "id", 2)
      .select("rank", "id").as[(Int, Long)].collect().toSeq.sorted
    assert(got == Seq((1, 3L), (2, 2L)))
  }

  test("NULL score or id rows are skipped; an all-NULL group vanishes") {
    val df = Seq(
      ("a", Some(2.0), Some(1L)), ("a", None, Some(2L)), ("a", Some(1.0), None),
      ("b", None, Some(9L)))
      .toDF("g", "score", "id")
    val got = Selection.topKPerGroup(df, Seq("g"), "score", "id", 3)
      .select("g", "id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 1L)), "only a's non-null row survives; b has no rankable rows")
  }

  test("k at or above the group size returns the whole group, ranked") {
    val df = Seq(("g", 3.0, 1L), ("g", 1.0, 2L), ("g", 2.0, 3L)).toDF("g", "score", "id")
    val got = Selection.topKPerGroup(df, Seq("g"), "score", "id", 10)
      .select("rank", "id").as[(Int, Long)].collect().toSeq.sorted
    assert(got == Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("composite group keys pass through") {
    val df = Seq(("a", 1, 5.0, 1L), ("a", 1, 7.0, 2L), ("a", 2, 3.0, 3L))
      .toDF("g1", "g2", "score", "id")
    val got = Selection.topKPerGroup(df, Seq("g1", "g2"), "score", "id", 1)
      .select("g1", "g2", "id").as[(String, Int, Long)].collect().toSet
    assert(got == Set(("a", 1, 2L), ("a", 2, 3L)))
  }

  test("guards: empty groupCols and k < 1 throw") {
    intercept[IllegalArgumentException](
      Selection.topKPerGroup(fixture, Seq(), "score", "id", 3))
    intercept[IllegalArgumentException](
      Selection.topKPerGroup(fixture, Seq("g"), "score", "id", 0))
  }

  test("full-row form matches the window with payload intact, partitioning-invariant") {
    val df = fixture.withColumn("payload", concat($"g", lit("#"), $"id"))
    val w = Window.partitionBy("g").orderBy($"score".desc, $"id".desc)
    val expected = df.withColumn("rank", row_number().over(w)).where($"rank" <= 4)
      .select("g", "rank", "score", "id", "payload").collect().toSet
    Seq(1, 7).foreach { p =>
      val got = Selection.topKPerGroupRows(df.repartition(p), Seq("g"),
          Seq("score", "id"), 4)
        .select("g", "rank", "score", "id", "payload").collect().toSet
      assert(got == expected, s"partitions=$p")
    }
  }

  test("full-row form: a NULL order field sorts lowest, losing to real scores") {
    val df = Seq(("g", Option(2.0), 1L, "hi"), ("g", Option.empty[Double], 2L, "nul"),
        ("g", Option(1.0), 3L, "lo"))
      .toDF("g", "score", "id", "payload")
    val got = Selection.topKPerGroupRows(df, Seq("g"), Seq("score", "id"), 2)
      .select("rank", "payload").as[(Int, String)].collect().toSet
    assert(got == Set((1, "hi"), (2, "lo")), "NULL-score row must rank last")
  }

  test("full-row form plans as ObjectHashAggregate — no sort, no window") {
    val plan = Selection.topKPerGroupRows(fixture, Seq("g"), Seq("score", "id"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected the typed aggregate:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("WindowExec"),
      s"sorting plan leaked in:\n$plan")
  }

  test("plan shape: partial + final aggregate, no WindowExec") {
    val plan = Selection.topKPerGroup(fixture, Seq("g"), "score", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into the plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed aggregate:\n$plan")
  }
}
