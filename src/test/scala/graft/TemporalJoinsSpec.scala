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

  test("asof backward: matched row's NULL values propagate, never an older row's") {
    import spark.implicits._
    // latest right row at t=15 has v=NULL, w=9.0 — ASOF must return that
    // row's (NULL, 9.0), not leak v=1.0 from the older t=10 row.
    val left = Seq((1L, "a", 20L)).toDF("event_id", "k", "t")
    val right = Seq(
      ("a", 10L, Option(1.0), Option(2.0)),
      ("a", 15L, Option.empty[Double], Option(9.0))).toDF("k", "t", "v", "w")
    val row = AsofJoin.backward(left, right, "k", "t", "t",
      Map("v" -> "v_out", "w" -> "w_out")).head()
    assert(row.isNullAt(row.fieldIndex("v_out")))
    assert(row.getAs[Double]("w_out") == 9.0)
  }

  test("asof backward: NULL keys and NULL timestamps never match") {
    import spark.implicits._
    val left = Seq(
      (1L, Option.empty[String], Option(10L)), // null key
      (2L, Option("a"), Option.empty[Long]),   // null ts
      (3L, Option("a"), Option(10L)))          // control: matches
      .toDF("event_id", "k", "t")
    val right = Seq(
      (Option.empty[String], Option(5L), 111.0), // null key: never matches
      (Option("a"), Option.empty[Long], 222.0),  // null ts: never matches
      (Option("a"), Option(5L), 7.0))
      .toDF("k", "t", "v")
    val got = AsofJoin.backward(left, right, "k", "t", "t", Map("v" -> "v_out"))
      .select("event_id", "v_out").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L) == null && got(2L) == null && got(3L) == 7.0)
  }

  test("asof inner: drops unmatched left rows, keeps matched-with-NULL-value rows") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L), (4L, "b", 50L),
        (5L, "c", 99L))
      .toDF("event_id", "k", "t")
    // the t=18 row matches event 2 with a NULL value — inner must KEEP it
    // (the MATCH exists; its value happens to be NULL)
    val right = Seq(("a", 10L, Option(1.0)), ("a", 18L, Option.empty[Double]),
        ("b", 60L, Option(3.0)))
      .toDF("k", "t", "v")
    val inner = AsofJoin.backward(left, right, "k", "t", "t",
        Map("v" -> "last_v"), joinType = "inner")
      .select("event_id", "last_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(inner.keySet == Set(1L, 2L), s"unmatched rows must drop: $inner")
    assert(inner(1L) == 1.0)
    assert(inner(2L) == null, "matched row with NULL value survives inner")
    // inner ≡ left-outer restricted to matched rows, on forward too
    val fwdLeft = AsofJoin.forward(left, right, "k", "t", "t", Map("v" -> "next_v"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    val fwdInner = AsofJoin.forward(left, right, "k", "t", "t",
        Map("v" -> "next_v"), joinType = "inner")
      .select("event_id").collect().map(_.getLong(0)).toSet
    // forward matches: 1 (t=10→right 10), 3 (t=5→right 10), 4 (t=50→right 60);
    // 2 (t=20, latest "a" right is 18) and 5 (no "c" rows) drop
    assert(fwdInner == Set(1L, 3L, 4L) && fwdLeft == Set(1L, 2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException](
      AsofJoin.backward(left, right, "k", "t", "t", Map("v" -> "x"), "full"))
  }

  test("asof tolerance: stale matches void in place, never widen to older rows") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L), (2L, "a", 200L), (3L, "b", 100L))
      .toDF("event_id", "k", "t")
    // for event 2 the LATEST at-or-before row is t=195 (gap 5, within);
    // for event 1 it's t=60 (gap 40, stale) — an older in-tolerance row
    // does NOT exist, and crucially t=60 must not be skipped for nothing
    val right = Seq(("a", 60L, 6.0), ("a", 195L, 9.0), ("b", 98L, 7.0))
      .toDF("k", "t", "v")
    def run(tol: Long, joinType: String = "left") =
      AsofJoin.backward(left, right, "k", "t", "t", Map("v" -> "last_v"),
          joinType, tolerance = Some(lit(tol)))
        .select("event_id", "last_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val tol10 = run(10L)
    assert(tol10(1L) == null, "stale match (gap 40 > 10) voids to NULL")
    assert(tol10(2L) == 9.0, "in-tolerance match survives")
    assert(tol10(3L) == 7.0)
    val tol50 = run(50L)
    assert(tol50(1L) == 6.0, "wider tolerance admits the same selected row")
    assert(run(10L, "inner").keySet == Set(2L, 3L),
      "inner drops tolerance-voided rows")
    // forward direction: gap measured the other way
    val fwd = AsofJoin.forward(left, right, "k", "t", "t", Map("v" -> "next_v"),
        tolerance = Some(lit(10L)))
      .select("event_id", "next_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // event 1 (t=100): next "a" row is 195, gap 95 > 10 → NULL
    assert(fwd(1L) == null && fwd(2L) == null && fwd(3L) == null)
    val fwdWide = AsofJoin.forward(left, right, "k", "t", "t", Map("v" -> "next_v"),
        tolerance = Some(lit(100L)))
      .select("event_id", "next_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(fwdWide(1L) == 9.0)
  }

  test("asof nearest: smaller absolute gap wins, backward wins ties") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L), (2L, "a", 200L), (3L, "a", 130L),
        (4L, "b", 50L), (5L, "c", 10L))
      .toDF("event_id", "k", "t")
    // event 1 (t=100): backward 60 (gap 40) vs forward 195 (gap 95) → 60
    // event 2 (t=200): backward 195 (gap 5), no forward → 195
    // event 3 (t=130): backward 60 (gap 70) vs forward 195 (gap 65) → 195
    // event 4 (t=50):  no backward, forward 98 (gap 48) → 98
    // event 5 (t=10):  key "c" has no right rows at all → NULL
    val right = Seq(("a", 60L, 6.0), ("a", 195L, 9.0), ("b", 98L, 7.0))
      .toDF("k", "t", "v")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "near_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val near = collect(AsofJoin.nearest(left, right, "k", "t", "t", Map("v" -> "near_v")))
    assert(near == Map(1L -> 6.0, 2L -> 9.0, 3L -> 9.0, 4L -> 7.0, 5L -> null))
    // exact tie: t=127.5 is not representable in longs; plant an equidistant
    // pair instead — backward must win
    val tieLeft = Seq((9L, "a", 120L)).toDF("event_id", "k", "t")
    val tieRight = Seq(("a", 110L, 1.0), ("a", 130L, 2.0)).toDF("k", "t", "v")
    assert(collect(AsofJoin.nearest(tieLeft, tieRight, "k", "t", "t",
      Map("v" -> "near_v"))) == Map(9L -> 1.0))
    // equal-ts right row: gap 0 via the backward sweep
    val eqRight = Seq(("a", 120L, 5.0), ("a", 121L, 8.0)).toDF("k", "t", "v")
    assert(collect(AsofJoin.nearest(tieLeft, eqRight, "k", "t", "t",
      Map("v" -> "near_v"))) == Map(9L -> 5.0))
    // tolerance = pandas |gap| ≤ tol over the picked winner (the farther
    // side can never out-survive the nearer one)
    val tol = collect(AsofJoin.nearest(left, right, "k", "t", "t",
      Map("v" -> "near_v"), tolerance = Some(lit(45L))))
    assert(tol == Map(1L -> 6.0, 2L -> 9.0, 3L -> null, 4L -> null, 5L -> null))
    // inner drops unmatched rows
    assert(collect(AsofJoin.nearest(left, right, "k", "t", "t",
      Map("v" -> "near_v"), joinType = "inner", tolerance = Some(lit(45L))))
      .keySet == Set(1L, 2L))
    // NULL-ts left rows never match, NULL-ts right rows never selected
    val nullLeft = Seq((7L, "a", null.asInstanceOf[java.lang.Long])).toDF("event_id", "k", "t")
    assert(collect(AsofJoin.nearest(nullLeft, right, "k", "t", "t",
      Map("v" -> "near_v"))) == Map(7L -> null))
  }

  test("asof nearest: plan has one exchange, two window sweeps") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L)).toDF("event_id", "k", "t")
    val right = Seq(("a", 60L, 6.0)).toDF("k", "t", "v")
    val plan = AsofJoin.nearest(left, right, "k", "t", "t", Map("v" -> "near_v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"nearest must not shuffle per sweep:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 2)
  }

  test("asof strict (allow_exact_matches=false): equal-ts rows excluded in all directions") {
    import spark.implicits._
    val left = Seq((1L, "a", 100L), (2L, "a", 50L)).toDF("event_id", "k", "t")
    val right = Seq(("a", 100L, 1.0), ("a", 60L, 2.0), ("a", 140L, 3.0))
      .toDF("k", "t", "v")
    def collect(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col("event_id"), col(c)).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // inclusive backward: event 1 matches the equal-ts row
    assert(collect(AsofJoin.backward(left, right, "k", "t", "t",
      Map("v" -> "x")), "x") == Map(1L -> 1.0, 2L -> null))
    // strict backward: equal-ts skipped IN FAVOR OF the previous row
    assert(collect(AsofJoin.backward(left, right, "k", "t", "t",
      Map("v" -> "x"), allowExactMatches = false), "x") == Map(1L -> 2.0, 2L -> null))
    // strict forward: equal-ts skipped in favor of the NEXT row
    assert(collect(AsofJoin.forward(left, right, "k", "t", "t",
      Map("v" -> "x"), allowExactMatches = false), "x") == Map(1L -> 3.0, 2L -> 2.0))
    // strict nearest: the equal-ts row (gap 0) is out on both sides; the
    // nearer survivor wins (backward 60 at gap 40 beats forward 140 at 40 —
    // tie goes backward)
    assert(collect(AsofJoin.nearest(left, right, "k", "t", "t",
      Map("v" -> "x"), allowExactMatches = false), "x") == Map(1L -> 2.0, 2L -> 2.0))
    // strict + tolerance compose: gap 40 > 30 voids both sides of event 1
    assert(collect(AsofJoin.nearest(left, right, "k", "t", "t",
      Map("v" -> "x"), tolerance = Some(lit(30L)), allowExactMatches = false),
      "x") == Map(1L -> null, 2L -> 2.0))
  }

  test("asof backward: left payload columns survive intact") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L, "keep")).toDF("id", "k", "t", "payload")
    val right = Seq(("a", 9L, 7.0)).toDF("k", "t", "v")
    val row = AsofJoin.backward(left, right, "k", "t", "t", Map("v" -> "w")).head()
    assert(row.getAs[String]("payload") == "keep" && row.getAs[Double]("w") == 7.0)
  }

  test("asof forward picks the earliest right row at-or-after; NULL ts/key never match") {
    import spark.implicits._
    val l = Seq((1L, "u", 10L), (2L, "u", 25L), (3L, "u", 100L),
      (4L, "v", 5L), (5L, null.asInstanceOf[String], 10L))
      .toDF("id", "k", "ts")
    val r = Seq(("u", 20L, "a"), ("u", 30L, "b"), ("u", 25L, "tie"),
      ("w", 1L, "other"), (null.asInstanceOf[String], 50L, "nullkey"))
      .toDF("k", "ts", "v")
    val got = graft.operators.AsofJoin.forward(l, r, "k", "ts", "ts",
        Map("v" -> "nxt"))
      .collect().map(rr => rr.getLong(rr.fieldIndex("id")) ->
        Option(rr.getString(rr.fieldIndex("nxt")))).toMap
    assert(got(1L).contains("a"))      // 10 → earliest ≥ is 20
    assert(got(2L).contains("tie"))    // inclusive at equal ts
    assert(got(3L).isEmpty)            // nothing at-or-after 100
    assert(got(4L).isEmpty)            // key with no right rows
    assert(got(5L).isEmpty)            // NULL key never matches
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

  test("binned range join: exact bins beyond 2^53 (epoch-nanosecond magnitudes)") {
    import spark.implicits._
    // 2^53 = 9007199254740992: double arithmetic is no longer exact here, so
    // floor(p / w) in double can misbin a boundary point and silently drop
    // its true match. These points sit exactly on / adjacent to bin edges.
    val base = 9007199254740992L // 2^53, itself a multiple of w=8
    val pts = Seq(base - 1, base, base + 1, base + 7, base + 8).toDF("__p")
    val ivs = Seq((1L, base, base + 7), (2L, base - 8, base - 1)).toDF("id", "__lo", "__hi")
    val got = RangeJoin.pointInInterval(pts, "__p", ivs, "__lo", "__hi", 8L)
      .select("__p", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((base - 1, 2L), (base, 1L), (base + 1, 1L), (base + 7, 1L))
    assert(got == want)
    // negative values: floor, not truncate-toward-zero
    val npts = Seq(-1L, -8L, -9L).toDF("__p")
    val nivs = Seq((9L, -9L, -1L)).toDF("id", "__lo", "__hi")
    val ngot = RangeJoin.pointInInterval(npts, "__p", nivs, "__lo", "__hi", 8L)
      .select("__p").collect().map(_.getLong(0)).toSet
    assert(ngot == Set(-1L, -8L, -9L))
  }

  test("interval overlap == naive overlap join; each pair emitted exactly once") {
    import spark.implicits._
    // spans crossing many bins, touching endpoints, disjoint, negative values
    val a = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, -40L, -10L), (4L, 200L, 210L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 90L, 150L), (11L, 60L, 61L), (12L, -20L, 0L), (13L, 400L, 500L))
      .toDF("b_id", "b_lo", "b_hi")
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = a.crossJoin(b)
        .where(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.sorted.toSeq == want.sorted.toSeq, s"binWidth=$w")
      assert(got.length == got.distinct.length, s"binWidth=$w: duplicate emission")
    }
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
