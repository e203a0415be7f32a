package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, History}

/** Pins SCD2 historization: interval construction against a hand-traced
  * fixture, NULL-state transitions, the keepLatest cross-differential on
  * the current rows, and the one-shuffle plan shape. */
class HistorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val obs = Seq(
    // user 1: a → a (collapse) → b → a : three intervals
    (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
    // user 2: NULL → NULL (collapse) → c : NULL state opens an interval
    (2L, 10L, null.asInstanceOf[String]), (2L, 15L, null.asInstanceOf[String]),
    (2L, 25L, "c"),
    // user 3: single observation → one open interval
    (3L, 99L, "z"))
    .toDF("uid", "v", "state").repartition(4)

  test("intervals collapse repeats, chain valid_to, and mark one current per key") {
    val got = History.historize(obs, Seq("uid"), Seq("v"), Seq("state"))
      .orderBy("uid", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, null, 10L, Some(25L), false),
      (2L, "c", 25L, None, true),
      (3L, "z", 99L, None, true)))
  }

  test("current rows agree with keepLatest on every key's state") {
    // state must not double as a version column
    val e = intercept[IllegalArgumentException] {
      History.historize(obs, Seq("uid"), Seq("v", "state"), Seq("state"))
    }
    assert(e.getMessage.contains("stateCols"))
    val cur = History.historize(obs, Seq("uid"), Seq("v"), Seq("state"))
      .where(col("is_current"))
      .select(col("uid"), col("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val latest = Dedup.keepLatest(obs, Seq("uid"), Seq("v"))
      .select(col("uid"), col("state"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(cur == latest,
      "the open interval's state must equal the compaction answer")
  }

  test("one shuffle: the change lag and the closing lead share the exchange") {
    val plan = History.historize(obs, Seq("uid"), Seq("v"), Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "ShuffleExchange|Exchange hashpartitioning".r
      .findAllIn(plan).size
    // one hash exchange from the input repartition feed + one for the key
    // partitioning at most; the second window must NOT add its own
    val keyExchanges = "hashpartitioning\\(uid".r.findAllIn(plan).size
    assert(keyExchanges <= 1, s"lead added its own shuffle:\n$plan")
  }
}
