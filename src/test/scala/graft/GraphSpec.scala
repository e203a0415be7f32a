package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // A→B (w 1), A→C (w 3), B→C (w 1); C dangling. d = 0.5, N = 3.
  private def triangle = Seq(
    ("A", "B", 1L), ("A", "C", 3L), ("B", "C", 1L)
  ).toDF("src", "dst", "w")

  test("pagerank: one hand-computed iteration with weights and a dangling node") {
    // shares: A→B 1/4, A→C 3/4, B→C 1; r0 = 1/3 each; D0 = r0(C) = 1/3
    // r1(A) = 1/6 + 0.5·(0     + 1/9) = 2/9
    // r1(B) = 1/6 + 0.5·(1/12  + 1/9) = 19/72
    // r1(C) = 1/6 + 0.5·(7/12  + 1/9) = 37/72
    val got = Graph.pagerank(triangle, "src", "dst", col("w"),
        iters = 1, damping = 0.5)
      .orderBy("node").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("A") - 2.0 / 9) < 1e-12)
    assert(math.abs(got("B") - 19.0 / 72) < 1e-12)
    assert(math.abs(got("C") - 37.0 / 72) < 1e-12)
  }

  test("pagerank: rank mass is conserved across iterations (dangling included)") {
    val out = Graph.pagerank(triangle, "src", "dst", col("w"),
      iters = 7, damping = 0.85)
    val total = out.agg(sum("rank")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"mass leaked: $total")
  }

  test("pagerank: uniform ranks are the fixed point of a regular symmetric graph") {
    // complete 4-node graph, equal weights: every node receives exactly
    // 1/N per iteration, so ranks stay 1/4
    val nodes = Seq("a", "b", "c", "d")
    val edges = (for {
      u <- nodes; v <- nodes if u != v
    } yield (u, v, 1L)).toDF("src", "dst", "w")
    val got = Graph.pagerank(edges, "src", "dst", col("w"),
        iters = 5, damping = 0.85)
      .collect().map(_.getDouble(1))
    got.foreach(r => assert(math.abs(r - 0.25) < 1e-12, got.mkString(",")))
  }

  test("pagerank: authority flows into the cited pair, not the mute spokes") {
    // everyone cites X, X cites back only A: the x↔a 2-cycle holds nearly
    // all the rank mass (oscillating between its ends per iteration —
    // which end is up depends on the snapshot's parity, so the pinned
    // claim is the PAIR dominating, not their internal order), while b/c
    // live on teleport mass alone and tie exactly by symmetry
    val edges = Seq(("a", "x", 1L), ("b", "x", 1L), ("c", "x", 1L),
      ("x", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.pagerank(edges, "src", "dst", col("w"),
        iters = 10, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("x") > 3 * got("b") && got("a") > 3 * got("b"), got.toString)
    assert(math.abs(got("b") - got("c")) < 1e-12)
  }

  test("pagerank: loud guards") {
    intercept[IllegalArgumentException](
      Graph.pagerank(triangle, "src", "dst", col("w"), iters = 0))
    intercept[IllegalArgumentException](
      Graph.pagerank(triangle, "src", "dst", col("w"), damping = 1.0))
    val nullEdge = Seq((Some("A"), Option.empty[String], 1L))
      .toDF("src", "dst", "w")
    val e1 = intercept[Exception](
      Graph.pagerank(nullEdge, "src", "dst", col("w")).collect())
    assert(e1.getMessage.contains("NULL edge endpoint"), e1.getMessage)
    val badW = Seq(("A", "B", -1L)).toDF("src", "dst", "w")
    val e2 = intercept[Exception](
      Graph.pagerank(badW, "src", "dst", col("w")).collect())
    assert(e2.getMessage.contains("non-positive edge weight"), e2.getMessage)
  }

  test("pagerank: reproducible to round4 across shuffle widths") {
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    def run(): Seq[(String, Double)] =
      Graph.pagerank(triangle, "src", "dst", col("w"), iters = 10)
        .select(col("node"), (floor(col("rank") * 10000 + 0.5) / 10000).as("r"))
        .orderBy("node").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val base = run()
    conf.set("spark.sql.shuffle.partitions", "5")
    val alt = try run() finally conf.set("spark.sql.shuffle.partitions", before)
    assert(base == alt)
  }
}
