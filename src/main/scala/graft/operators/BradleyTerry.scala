package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bradley–Terry strength estimation from pairwise win/loss records — the
  * arena-ranking aggregation behind model leaderboards and preference-data
  * curation (which source/model/annotator wins head-to-heads after strength
  * of schedule is accounted for). Fit by Hunter's MM algorithm (Hunter 2004,
  * "MM algorithms for generalized Bradley–Terry models"):
  *
  * {{{
  * w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j)     then normalize Σ w = K
  * }}}
  *
  * No reference analog (`operators.py:80` delegates to Postgres); SURVEY
  * §2c extension territory, sibling of [[Graph]] PageRank (same
  * iterate-with-narrow-shuffles discipline) and of the GD trainers
  * ([[LogisticRegression]]) on the oracle side.
  */
object BradleyTerry {

  /** Fit BT strengths from a match log (one row per decided match).
    *
    * Regularization: `smoothing` phantom wins are added in BOTH directions
    * of every OBSERVED pair (default 0.5 — Davidson-style), so one-sided
    * records can't push a strength to +∞ and every observed item keeps
    * W_i > 0; the comparison graph must still be connected for a unique
    * optimum (at our gate the consecutive-document match chain is).
    *
    * Shape: the match log collapses ONCE into an unordered-pair frame
    * (one (i, j)-keyed count shuffle — the only corpus-sized pass); each of
    * the `iters` fixed MM iterations is two item-keyed hash joins of the
    * |pairs|-row directed frame against the |items|-row strength frame plus
    * one item-keyed partial aggregation — narrow (item, double) rows
    * through every shuffle and exactly ONE driver action (the eager
    * iteration cut) per iteration, the [[Graph.pagerank]] discipline. The
    * Σ w = K normalization is a single broadcast 1-row aggregate applied
    * once at the end (the MM update is scale-equivariant, so per-iteration
    * normalization would change nothing but the job count).
    *
    * Determinism: the update is branch-free float arithmetic; per-item
    * denominator sums are fold-order-dependent across partitions, so
    * strengths reproduce to ~1e-13 relative — canonicalize with round6 at
    * the consumer (divergence never compounds into a different trajectory).
    *
    * NULL endpoints and self-matches (winner = loser) fail loudly.
    * Output: (item, n_games, n_wins, strength) with raw integer
    * game/win counts (smoothing excluded) and Σ strength = |items|. */
  def fit(matches: DataFrame, winnerCol: String, loserCol: String,
          iters: Int = 15, smoothing: Double = 0.5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(smoothing > 0.0, s"smoothing must be > 0, got $smoothing")
    val g = matches.select(
      when(col(winnerCol).isNull || col(loserCol).isNull,
        raise_error(lit("bradleyTerry: NULL match endpoint")))
        .otherwise(col(winnerCol)).as("__w"),
      when(col(winnerCol) === col(loserCol),
        raise_error(lit("bradleyTerry: self-match (winner = loser)")))
        .otherwise(col(loserCol)).as("__l"))
    // unordered pair frame: one corpus-sized count shuffle, then phantom
    // wins in both directions of every observed pair
    val pairs = g.select(
        least(col("__w"), col("__l")).as("__i"),
        greatest(col("__w"), col("__l")).as("__j"),
        when(col("__w") < col("__l"), 1L).otherwise(0L).as("__wi"))
      .groupBy("__i", "__j")
      .agg(count(lit(1)).as("__n"), sum("__wi").as("__wins_i"))
      .select(col("__i"), col("__j"),
        (col("__n") + 1L).cast("double").as("__ns"),
        (col("__wins_i") + smoothing).as("__wsi"),
        (col("__n") - col("__wins_i") + smoothing).as("__wsj"),
        col("__n"), col("__wins_i"))
      .localCheckpoint(true)
    val directed = pairs.select(col("__i").as("__a"), col("__j").as("__b"),
        col("__ns"))
      .union(pairs.select(col("__j"), col("__i"), col("__ns")))
      .localCheckpoint(true)
    val wins = pairs.select(col("__i").as("item"), col("__wsi").as("__ww"),
        col("__n"), col("__wins_i").as("__nw"))
      .union(pairs.select(col("__j"), col("__wsj"),
        col("__n"), (col("__n") - col("__wins_i"))))
      .groupBy("item")
      .agg(sum("__ww").as("__W"), sum("__n").as("n_games"),
        sum("__nw").as("n_wins"))
      .localCheckpoint(true)
    val k = wins.count()
    require(k >= 2, s"bradleyTerry: need >= 2 distinct items, got $k")
    // The MM update is scale-EQUIVARIANT (scaling every w by c scales every
    // updated w by c), so the Σ w = K normalization is applied ONCE at the
    // end instead of per iteration — same trajectory up to float rounding,
    // one job per iteration instead of two (no per-pass broadcast of the
    // normalizing sum). Iteration state is cut with Iteration.cut, not a
    // bare localCheckpoint: the state ⋈ edges ⋈ state shape would otherwise
    // compound Catalyst's multiplicative size estimate into multi-megabit
    // BigIntegers and stall the planner (see [[Iteration]]).
    var ranks = Iteration.cut(wins.select(col("item"), lit(1.0).as("__s")))
    var t = 0
    while (t < iters) {
      val denom = directed
        .join(ranks.select(col("item").as("__a"), col("__s").as("__sa")),
          Seq("__a"))
        .join(ranks.select(col("item").as("__b"), col("__s").as("__sb")),
          Seq("__b"))
        .groupBy(col("__a").as("item"))
        .agg(sum(col("__ns") / (col("__sa") + col("__sb"))).as("__d"))
      val raw = wins.select(col("item"), col("__W"))
        .join(denom, Seq("item"))
        .select(col("item"), (col("__W") / col("__d")).as("__s"))
      ranks = Iteration.cut(raw)
      t += 1
    }
    // final Σ w = K normalization: a broadcast 1-row aggregate in-plan
    val tot = ranks.agg(sum("__s").as("__tot"))
    wins.select(col("item"), col("n_games"), col("n_wins"))
      .join(ranks, Seq("item"))
      .crossJoin(broadcast(tot))
      .select(col("item"), col("n_games"), col("n_wins"),
        (col("__s") * k / col("__tot")).as("strength"))
  }
}
