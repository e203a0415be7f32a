package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals (Hanley & MacGibbon 2006; the
  * Efron 1979 bootstrap made single-pass — the production CI recipe at
  * corpus scale, where true resampling would need B full shuffles of the
  * data): each row enters replicate j with a Poisson(1) multiplicity
  * instead of being drawn without replacement, so ALL B replicate
  * estimates come from ONE pass with map-side partial aggregation. The
  * multiplicities are DETERMINISTIC — the x06d sha256 unit hash of
  * `id:boot:j` inverted through the fixed Poisson(1) CDF table — so the
  * whole CI is reproducible across runs, partitionings, and engines (the
  * x131 randomization discipline applied to estimation instead of
  * testing). No reference analog (`operators.py:80`); SURVEY §2c
  * extension — the uncertainty read next to x140's CUPED point estimate
  * and x143's pre-experiment sizing.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF as shared 17-digit literals — P(W ≤ k) for
    * k = 0..5; u above the last threshold maps to weight 6 (probability
    * ~6e-5; the truncation bias is far below bootstrap noise). Literals,
    * not `exp(-1)` arithmetic, so both engines compare against identical
    * doubles. */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, // e⁻¹
    0.7357588823428847, // 2e⁻¹
    0.9196986029286058, // (5/2)e⁻¹
    0.9810118431238462, // (8/3)e⁻¹
    0.9963401531726563, // (65/24)e⁻¹
    0.9994058151824183) // (163/60)e⁻¹

  private def weight(u: Column): Column =
    PoissonCdf.foldLeft(lit(0)) { (acc, t) =>
      acc + when(u >= t, 1).otherwise(0)
    }

  /** One row per group: `(group, n, mean, ci_lo, ci_hi, n_replicates)` —
    * the full-sample mean plus the empirical `[α/2, 1−α/2]` percentile
    * interval of the `replicates` Poisson-bootstrap replicate means.
    * Replicate means are exact-integer ratios for integer metrics (the
    * weighted sums fold exactly), and the percentile pick rides
    * [[Percentiles.exactByGroup]] — the same `(1−d)·lo + d·hi`
    * interpolation as `percentile()` / `QUANTILE_CONT`, so the interval
    * is cross-engine-replayable (gate pins round6). A degenerate
    * replicate (every weight 0 — only plausible at toy n) carries a NULL
    * mean and is excluded from the interval, matching QUANTILE_CONT's
    * NULL handling. NULL id/group/value fail loudly.
    *
    * Shape: ONE `explode(sequence(0, B−1))` pass whose aggregate partials
    * are (group × B)-bounded (map-side combine collapses the ×B row
    * inflation before the shuffle), then quantiles over B-row-per-group
    * frames. Work scales as corpus × B, embarrassingly parallel — bound
    * `replicates`, not the corpus. */
  def poissonBootstrapCI(df: DataFrame, idCol: String, groupCol: String,
                         valueCol: String, replicates: Int,
                         alpha: Double): DataFrame =
    bootstrapCore(df, idCol, groupCol, valueCol, replicates, alpha)

  /** [[poissonBootstrapCI]] resampling whole CLUSTERS instead of rows —
    * the user-level bootstrap every event-metric CI actually needs: rows
    * within a user are correlated, and a row-level resample treats them
    * as independent, understating the variance (Owen & Eckles 2012, Ann.
    * Appl. Stat. "Bootstrapping data arrays"). All rows sharing
    * `clusterCol` draw ONE multiplicity per replicate (the hash keys on
    * the cluster, not the row), so within-cluster structure enters or
    * leaves a replicate whole; the replicate mean is the ratio estimator
    * `Σ_c w_c·sum_c / Σ_c w_c·n_c` — algebraically identical to weighting
    * every row, because the weight is constant within a cluster.
    *
    * Shape: ONE row-bounded (group, cluster) pre-aggregate collapses the
    * corpus to cluster totals FIRST, so the ×B explode (and its sha256
    * per draw) runs over clusters × B, not rows × B — at event-level data
    * that is the difference between hashing every event 200 times and
    * hashing every user 200 times. The row form coincides with this one
    * when `clusterCol` is unique per row (spec-pinned within fold
    * tolerance — the per-cluster pre-sum reorders the IEEE fold). */
  def clusterPoissonBootstrapCI(df: DataFrame, clusterCol: String,
                                groupCol: String, valueCol: String,
                                replicates: Int, alpha: Double): DataFrame = {
    require(replicates >= 2, s"need at least 2 replicates: $replicates")
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val base = df.select(
      when(col(groupCol).isNull || col(valueCol).isNull
          || col(clusterCol).isNull,
        raise_error(lit(s"poissonBootstrapCI: NULL $clusterCol/$groupCol/" +
          s"$valueCol — drop or impute upstream")))
        .otherwise(col(groupCol)).as("__g"),
      col(clusterCol).cast("string").as("__id"),
      col(valueCol).cast("double").as("__v"))
    val point = base.groupBy("__g")
      .agg(count(lit(1)).as("n"),
        (sum("__v") / count(lit(1)).cast("double")).as("mean"))
    val perCluster = base.groupBy("__g", "__id")
      .agg(count(lit(1)).as("__cn"), sum("__v").as("__cs"))
    val u = Sampling.hashUnit(
      concat_ws(":", col("__id"), lit("boot"), col("__j").cast("string")))
    val means = perCluster
      .withColumn("__j", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__w", weight(u))
      .groupBy("__g", "__j")
      .agg(sum(col("__w").cast("long") * col("__cn")).as("__sw"),
        sum(col("__w").cast("double") * col("__cs")).as("__swv"))
      .select(col("__g"),
        when(col("__sw") > 0, col("__swv") / col("__sw").cast("double"))
          .as("__m"))
      .where(col("__m").isNotNull)
    val ci = Percentiles.exactByGroup(means, "__g", "__m",
      Seq(alpha / 2.0, 1.0 - alpha / 2.0), Seq("ci_lo", "ci_hi"))
    point.join(ci, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n"), col("mean"),
        col("ci_lo"), col("ci_hi"),
        lit(replicates).as("n_replicates"))
  }

  private def bootstrapCore(df: DataFrame, keyCol: String, groupCol: String,
                            valueCol: String, replicates: Int,
                            alpha: Double): DataFrame = {
    require(replicates >= 2, s"need at least 2 replicates: $replicates")
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1): $alpha")
    val base = df.select(
      when(col(groupCol).isNull || col(valueCol).isNull
          || col(keyCol).isNull,
        raise_error(lit(s"poissonBootstrapCI: NULL $keyCol/$groupCol/" +
          s"$valueCol — drop or impute upstream")))
        .otherwise(col(groupCol)).as("__g"),
      col(keyCol).cast("string").as("__id"),
      col(valueCol).cast("double").as("__v"))
    val point = base.groupBy("__g")
      .agg(count(lit(1)).as("n"),
        (sum("__v") / count(lit(1)).cast("double")).as("mean"))
    val u = Sampling.hashUnit(
      concat_ws(":", col("__id"), lit("boot"), col("__j").cast("string")))
    val means = base
      .withColumn("__j", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__w", weight(u))
      .groupBy("__g", "__j")
      .agg(sum(col("__w").cast("long")).as("__sw"),
        sum(col("__w").cast("double") * col("__v")).as("__swv"))
      .select(col("__g"),
        when(col("__sw") > 0, col("__swv") / col("__sw").cast("double"))
          .as("__m"))
      .where(col("__m").isNotNull)
    val ci = Percentiles.exactByGroup(means, "__g", "__m",
      Seq(alpha / 2.0, 1.0 - alpha / 2.0), Seq("ci_lo", "ci_hi"))
    point.join(ci, Seq("__g"), "left")
      .select(col("__g").as(groupCol), col("n"), col("mean"),
        col("ci_lo"), col("ci_hi"),
        lit(replicates).as("n_replicates"))
  }
}
