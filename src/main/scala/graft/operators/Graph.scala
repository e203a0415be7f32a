package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph centrality over edge lists — the source-authority rank
  * behind crawl-seed prioritization (the Common Crawl host-ranking use:
  * given "who duplicates whom" or "who links to whom", score every node so
  * selection budgets and trust decisions can weight by upstream-ness).
  * No reference analog (`operators.py` delegates everything to Postgres);
  * SURVEY §2c extension territory, sibling of
  * [[ConnectedComponents]] (same iterate-with-narrow-shuffles discipline).
  */
object Graph {

  /** Weighted PageRank over an edge list.
    *
    * {{{
    * r₀(v)    = 1/N
    * r_{k+1}(v) = (1−d)/N + d·( Σ_{(u,v)∈E} (w_uv / W_u)·r_k(u) + D_k/N )
    * }}}
    * where `W_u = Σ_v w_uv` (out-weight), `D_k = Σ_{u dangling} r_k(u)`
    * (rank mass parked on nodes with no out-edges, redistributed
    * uniformly — the standard teleport treatment, so Σ_v r_k(v) = 1 at
    * every step up to float rounding).
    *
    * Shape: the edge shares `(src, dst, w/W_u)` are computed ONCE (one
    * out-weight aggregation + one join, then localCheckpoint — iterations
    * never rescan the raw edges); each of the `iters` fixed iterations is
    * one hash join of the |V|-row rank frame against the shares + one
    * dst-keyed partial aggregation — narrow (node, double) rows through
    * every shuffle, never edge payloads — and exactly ONE driver action
    * (the eager checkpoint). The dangling mass rides the SAME job as a
    * broadcast 1-row aggregate crossed into the update (no per-iteration
    * `head()` round-trip); when the dangling set is empty — checked once
    * before the loop — the term is the literal 0.0 and the semi-join is
    * skipped entirely. Rank state is cut per iteration with
    * [[Iteration.cut]] (eager localCheckpoint + a fresh statistics leaf),
    * so plans stay iteration-depth-independent in size AND in the
    * magnitude of Catalyst's multiplicative size stats — a bare
    * localCheckpoint inherits them, and the dangling-path crossJoin would
    * compound the stat into planner-stalling BigIntegers past ~20
    * iterations.
    *
    * Determinism: per-edge shares are exact divisions of engine-identical
    * doubles; per-node contribution sums are float aggregates whose fold
    * order varies with partitioning, so ranks are reproducible to ~1e-15
    * relative per iteration (canonicalize with round4 at the consumer —
    * the update is branch-free, so divergence never compounds into a
    * different trajectory, unlike GD's accept/reject knife edges).
    *
    * NULL endpoints and NULL/non-positive weights fail loudly (a silently
    * dropped edge would skew every downstream rank). Self-loops are legal
    * (a node may cite itself; the share just returns to it). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               weight: Column, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val e = edges.select(
      when(col(srcCol).isNull || col(dstCol).isNull,
        raise_error(lit("pagerank: NULL edge endpoint")))
        .otherwise(col(srcCol)).as("__src"),
      col(dstCol).as("__dst"),
      when(weight.isNull || isnan(weight) || weight <= 0.0,
        raise_error(lit("pagerank: NULL/NaN/non-positive edge weight")))
        .otherwise(weight.cast("double")).as("__w"))
    val outW = e.groupBy("__src").agg(sum("__w").as("__outw"))
    val shares = e.join(outW, "__src")
      .select(col("__src"), col("__dst"),
        (col("__w") / col("__outw")).as("__share"))
      .localCheckpoint(true)
    val verts = e.select(col("__src").as("node"))
      .union(e.select(col("__dst")))
      .distinct()
      .localCheckpoint(true)
    val n = verts.count()
    require(n > 0, "pagerank: empty edge list")
    // nodes with no out-edges: their rank mass teleports uniformly
    val dangling = verts.join(
        shares.select(col("__src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .localCheckpoint(true)
    val base = (1.0 - damping) / n
    // one count up front decides whether any iteration ever needs the
    // dangling-mass term; a graph where every node has out-edges (the
    // common symmetrized case) pays nothing per iteration
    val nDangling = dangling.count()
    var ranks = Iteration.cut(
      verts.select(col("node"), lit(1.0 / n).as("rank")))
    var k = 0
    while (k < iters) {
      val sums = shares.join(ranks, shares("__src") === ranks("node"))
        .select(col("__dst").as("node"),
          (col("__share") * col("rank")).as("__c"))
        .groupBy("node").agg(sum("__c").as("__s"))
      val next =
        if (nDangling == 0L)
          verts.join(sums, Seq("node"), "left")
            .select(col("node"),
              (lit(base) + lit(damping) *
                (coalesce(col("__s"), lit(0.0)) + lit(0.0))).as("rank"))
        else {
          // same aggregate the old per-iteration head() ran, now a
          // broadcast 1-row frame in the SAME job as the update
          val dang = ranks.join(dangling, Seq("node"), "left_semi")
            .agg((coalesce(sum("rank"), lit(0.0)) / n).as("__dshare"))
          verts.join(sums, Seq("node"), "left")
            .crossJoin(broadcast(dang))
            .select(col("node"),
              (lit(base) + lit(damping) *
                (coalesce(col("__s"), lit(0.0)) + col("__dshare"))).as("rank"))
        }
      ranks = Iteration.cut(next)
      k += 1
    }
    ranks
  }
}
