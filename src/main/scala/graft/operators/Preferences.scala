package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Preference-pair construction — the RLHF/DPO data-prep step: turn scored
  * candidate responses grouped by prompt into (chosen, rejected) training
  * pairs. Two policies:
  *
  *  - [[bestVsRest]]: the group's top candidate against every other
  *    candidate whose score sits at least `minMargin` below it — the
  *    "clear winner" recipe (InstructGPT-style K-choose-best labeling
  *    yields exactly these comparisons).
  *  - [[adjacentPairs]]: consecutive candidates in score order, kept when
  *    the gap is ≥ `minMargin` — the "hardest informative pairs" recipe
  *    (DPO ablations favor near-boundary pairs; adjacent ranks are the
  *    closest pairs that still order).
  *
  * Both rank with a TOTAL order ((score DESC, id ASC) — ties broken by
  * id, so pair direction is deterministic) and emit
  * (groupCol, chosen_id, rejected_id, chosen_score, rejected_score,
  * margin). Candidates with NULL scores are dropped up front (an unscored
  * response can neither win nor lose meaningfully); groups of one emit
  * nothing.
  *
  * Shape: ONE hash shuffle on the group for the ranking window, and both
  * policies stay inside it — bestVsRest carries the group winner along
  * every row as a `first_value` (no self-join, no second scan),
  * adjacentPairs is a lag in the same window. Per-group candidate counts
  * are bounded in practice (a prompt has K responses, not millions), the
  * regime both policies assume; nothing is driver-side. */
object Preferences {

  private def ranked(df: DataFrame, groupCol: String, idCol: String,
                     scoreCol: Column): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__s").desc, col(idCol).asc)
    df.where(scoreCol.isNotNull)
      .select(col(groupCol), col(idCol), scoreCol.as("__s"))
      .withColumn("__rk", row_number().over(w))
  }

  /** Top candidate vs every candidate ≥ `minMargin` below it. Single
    * window pass: the group's winner rides along every row as
    * `first_value` over the ranked frame — no self-join, no second scan,
    * one shuffle total. */
  def bestVsRest(df: DataFrame, groupCol: String, idCol: String,
                 scoreCol: Column, minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__s").desc, col(idCol).asc)
    ranked(df, groupCol, idCol, scoreCol)
      .select(col(groupCol),
        first(col(idCol)).over(w).as("chosen_id"),
        col(idCol).as("rejected_id"),
        first(col("__s")).over(w).as("chosen_score"),
        col("__s").as("rejected_score"), col("__rk"))
      .where(col("__rk") > 1 &&
        col("chosen_score") - col("rejected_score") >= minMargin)
      .select(col(groupCol), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  /** Consecutive candidates in (score DESC, id ASC) order, kept when the
    * score gap is ≥ `minMargin`. */
  def adjacentPairs(df: DataFrame, groupCol: String, idCol: String,
                    scoreCol: Column, minMargin: Double = 0.0): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0, got $minMargin")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__s").desc, col(idCol).asc)
    ranked(df, groupCol, idCol, scoreCol)
      .select(col(groupCol),
        lag(col(idCol), 1).over(w).as("chosen_id"),
        col(idCol).as("rejected_id"),
        lag(col("__s"), 1).over(w).as("chosen_score"),
        col("__s").as("rejected_score"))
      .where(col("chosen_id").isNotNull &&
        col("chosen_score") - col("rejected_score") >= minMargin)
      .select(col(groupCol), col("chosen_id"), col("rejected_id"),
        col("chosen_score"), col("rejected_score"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  /** Bradley–Terry reward-model training frame: join candidate FEATURES
    * onto each (chosen, rejected) pair and emit the feature DIFFERENCES
    * Δf = f(chosen) − f(rejected), SYMMETRIZED — each pair contributes
    * (Δf, y=1) and (−Δf, y=0) — so fitting [[LogisticRegression.train]]
    * on the result minimizes the Bradley–Terry log-loss
    * log(1 + exp(−w·Δf)) with the bias pinned at 0 by symmetry (the
    * InstructGPT reward-modeling objective, Ouyang et al. 2022, on
    * inspectable linear features). The fitted weights score ANY candidate
    * via `Scoring.applyLinearModel`; pairwise accuracy is then
    * "score(chosen) > score(rejected)" by construction of the margin.
    *
    * Shape: two hash joins of the pairs frame against the (id, features)
    * projection — chosen side then rejected side, both key-bounded — and
    * a map-only symmetrize union. `feats` must be unique per id (join
    * multiplicity would silently duplicate training pairs — guarded). */
  def rewardModelTrainingFrame(pairs: DataFrame, feats: DataFrame,
                               idCol: String,
                               featureCols: Seq[String]): DataFrame = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    // uniqueness guard in ONE aggregation pass (count + count_distinct in
    // the same job) — the two-action spelling scanned feats twice per call
    val u = feats.agg(count(lit(1)).as("n"),
      count_distinct(col(idCol)).as("nd")).head()
    val (n, nd) = (u.getLong(0), u.getLong(1))
    require(n == nd,
      s"feats must be unique per $idCol: $n rows, $nd distinct ids")
    def side(prefix: String): DataFrame =
      feats.select(col(idCol).as(s"${prefix}_id") +:
        featureCols.map(c => col(c).cast("double").as(s"__${prefix}_$c")): _*)
    val joined = pairs
      .join(side("chosen"), Seq("chosen_id"))
      .join(side("rejected"), Seq("rejected_id"))
    val diffs = featureCols.map(c =>
      (col(s"__chosen_$c") - col(s"__rejected_$c")).as(s"d_$c"))
    val pos = joined.select(diffs :+ lit(1.0).as("y"): _*)
    val neg = joined.select(featureCols.map(c =>
      (col(s"__rejected_$c") - col(s"__chosen_$c")).as(s"d_$c")) :+
      lit(0.0).as("y"): _*)
    pos.unionByName(neg)
  }
}
