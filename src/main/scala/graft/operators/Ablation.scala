package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-group-out data ablation — the first question of mixture
  * curation ("which source/language is pulling this corpus metric, and
  * which way?") answered WITHOUT training anything: for each group, the
  * corpus mean of a metric with that group removed, next to the full-corpus
  * mean and the delta. The jackknife estimator shape [Quenouille 1956;
  * Efron, "The Jackknife, the Bootstrap and Other Resampling Plans", 1982,
  * public] applied at group granularity — the cheap screening pass run
  * before anything DoReMi-shaped ([[MixtureOptimization]]) spends training
  * compute on the mixture.
  *
  * Shape: ONE metric-keyed aggregation pass over the corpus (map-side
  * partial count/sum, K group rows out), then a broadcast join of the
  * K-row frame against its own 1-row total — all leave-one-out means are
  * closed-form from (S − s_g)/(N − n_g), so no group is ever rescanned.
  * Nothing scales with corpus size except the single scan; K is
  * model-artifact-sized by assumption (sources, languages).
  *
  * Semantics: NULL metric values are excluded from both n and s (count/sum
  * ignore them) but the row still belongs to its group; a NULL group key
  * is its own group row (surfaced, not dropped — silently losing a
  * NULL-keyed slice would misreport every delta). `mean_without` is NULL
  * only for a group that holds ALL non-null metric rows (nothing
  * remains); a group whose metric values are ALL NULL contributes
  * nothing to the sum, so removing it reports `mean_without = mean_all`
  * and `delta = 0` (its NULL sum is coalesced to 0, not propagated).
  * Exact-integer metrics (counts, byte/token lengths) make every output
  * bit-exact across engines; double metrics carry the usual sum-order
  * contract. */
object Ablation {

  /** Output: one row per group — `groupCol`, `n` (non-null metric rows in
    * the group), `mean_in` (group mean), `mean_all` (full-corpus mean),
    * `mean_without` (corpus mean with the group removed), `delta`
    * (= mean_all − mean_without; positive = the group pulls the corpus
    * mean UP). */
  def leaveOneOut(df: DataFrame, groupCol: String,
                  metricCol: String): DataFrame = {
    val m = col(metricCol).cast("double")
    // K-row frame with two consumers (its own total + the join) —
    // checkpoint-pinned so the corpus aggregation runs exactly once
    // (the repo's double-action rule), K rows of state
    val groups = df.groupBy(groupCol)
      .agg(count(m).as("n"), sum(m).as("__s"))
      .localCheckpoint(true)
    val totals = groups.agg(sum("n").as("__tn"), sum("__s").as("__ts"))
    // an all-NULL-metric group has __s = NULL (sum over zero non-null
    // rows): coalesce to 0 so removing it reports mean_without = mean_all
    // and delta = 0, not a propagated NULL
    val s0 = coalesce(col("__s"), lit(0.0))
    groups.crossJoin(broadcast(totals))
      .select(col(groupCol), col("n"),
        (col("__s") / col("n")).as("mean_in"),
        (col("__ts") / col("__tn")).as("mean_all"),
        when(col("__tn") > col("n"),
          (col("__ts") - s0) / (col("__tn") - col("n")))
          .as("mean_without"),
        when(col("__tn") > col("n"),
          col("__ts") / col("__tn")
            - (col("__ts") - s0) / (col("__tn") - col("n")))
          .as("delta"))
  }
}
