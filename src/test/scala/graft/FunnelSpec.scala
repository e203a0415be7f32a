package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("funnelSteps: order matters, ties don't advance, denominators complete") {
    val ev = Seq(
      // user 1: clean full funnel
      (1L, "2024-01-01 08:00:00", "view"),
      (1L, "2024-01-01 08:05:00", "click"),
      (1L, "2024-01-01 08:10:00", "purchase"),
      // user 2: the only purchase lands BEFORE the click, so view→click
      // completes but the purchase step can't — stops at 2
      (2L, "2024-01-01 08:00:00", "view"),
      (2L, "2024-01-01 08:01:00", "purchase"),
      (2L, "2024-01-01 08:02:00", "click"),
      // user 3: clicks without ever viewing — 0 steps
      (3L, "2024-01-01 08:00:00", "click"),
      (3L, "2024-01-01 08:01:00", "purchase"),
      // user 4: click at the SAME instant as view — strict > rejects it
      (4L, "2024-01-01 08:00:00", "view"),
      (4L, "2024-01-01 08:00:00", "click"),
      // user 5: early out-of-order click, then a later valid one — the
      // greedy takes view's min then the NEXT click after it
      (5L, "2024-01-01 08:01:00", "view"),
      (5L, "2024-01-01 08:00:00", "click"),
      (5L, "2024-01-01 08:02:00", "click"),
      (5L, "2024-01-01 08:03:00", "purchase"))
      .toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_type"))
    val got = Funnel.funnelSteps(ev, "user_id", "ts", "event_type", steps)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, true), (2L, 2L, false), (3L, 0L, false),
      (4L, 1L, false), (5L, 3L, true)))
  }

  test("funnelSteps: loud guards on empty and duplicate steps") {
    val ev = Seq((1L, "2024-01-01 08:00:00", "view"))
      .toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException](
      Funnel.funnelSteps(ev, "user_id", "ts", "event_type", Nil))
    intercept[IllegalArgumentException](
      Funnel.funnelSteps(ev, "user_id", "ts", "event_type",
        Seq("view", "view")))
  }

  test("funnelSteps: NULL keys are dropped, never reported as zero-progress") {
    // a NULL key never equi-joins, so before the r18 fix a NULL-key user
    // with a complete ordered funnel would report steps_completed = 0 — a
    // silently WRONG row; the documented convention now excludes it
    val ev = Seq(
      (Some(1L), "2024-01-01 08:00:00", "view"),
      (Some(1L), "2024-01-01 08:01:00", "click"),
      (None, "2024-01-01 08:00:00", "view"),
      (None, "2024-01-01 08:01:00", "click"),
      (None, "2024-01-01 08:02:00", "purchase"))
      .toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_type"))
    val got = Funnel.funnelSteps(ev, "user_id", "ts", "event_type", steps)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)),
      s"only the non-NULL key may surface: ${got.toSeq}")
  }
}
