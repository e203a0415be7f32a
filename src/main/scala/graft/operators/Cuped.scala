package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance reduction (Deng, Xu, Kohavi & Walker WSDM'13) — the
  * experiment-analysis read: when a pre-treatment covariate x correlates
  * with the metric y, the adjusted metric `y* = y − θ(x − E[x])` with
  * `θ = cov(x,y)/var(x)` has variance `var(y)·(1 − ρ²)` — the same
  * comparison decided with far fewer samples. In a data pipeline this is
  * how A/B reads on curation changes (filter tweaks, mixture shifts)
  * reach significance on high-variance metrics, using last-period
  * behavior as the covariate. No reference analog (`operators.py:80`);
  * SURVEY §2c extension, the variance-reduction complement of the
  * TwoSample family.
  */
object Cuped {

  /** Welch's t on the CUPED-adjusted metric between two groups, computed
    * ENTIRELY from joint moments — one row `(n_a, n_b, theta, rho2,
    * mean_adj_a, mean_adj_b, t_raw, t_adj)`. θ and E[x] come from the
    * pooled sample (the standard estimator); per-group adjusted
    * means/variances follow algebraically:
    * `mean* = ȳ_g − θ(x̄_g − x̄)`,
    * `var*  = var(y)_g − 2θ·cov(x,y)_g + θ²·var(x)_g`.
    *
    * The algebra is the point for determinism AND scale: materializing
    * adjusted ROWS would make every downstream sum a fold of arbitrary
    * doubles (order-dependent cross-engine), where the moment route keeps
    * every sum exact for integer-valued y and x and every derived value a
    * fixed IEEE expression. ONE conditional-moments aggregate pass,
    * map-side partials, no second scan, no window. `t_raw` is plain
    * Welch on y (the unadjusted read comes free for comparison). NULLs
    * and empty groups fail loudly; `theta`/`rho2`/adjusted outputs are
    * NULL when pooled var(x) = 0 (θ undefined), and each t is NULL when
    * its variance degenerates or either n < 2 — all divisions sit inside
    * lazy branches (the ANSI discipline). Consumers hash-pinning should
    * canonicalize (the gate pins round6). */
  def welchTAdjusted(df: DataFrame, groupCol: String, metricCol: String,
                     covariateCol: String, groupA: String,
                     groupB: String): DataFrame = {
    require(groupA != groupB, s"groups must differ, got $groupA")
    val g = when(col(groupCol).isNull || col(metricCol).isNull
        || col(covariateCol).isNull,
      raise_error(lit(s"cuped: NULL $groupCol/$metricCol/$covariateCol — " +
        "drop or impute upstream")))
      .otherwise(col(groupCol))
    val base = df.select(g.as("__g"),
        col(metricCol).cast("double").as("__y"),
        col(covariateCol).cast("double").as("__x"))
      .filter(col("__g").isin(groupA, groupB))
    def side(grp: String, t: String) = Seq(
      sum(when(col("__g") === grp, 1L).otherwise(0L)).as(s"n_$t"),
      sum(when(col("__g") === grp, col("__y")).otherwise(0.0)).as(s"sy$t"),
      sum(when(col("__g") === grp, col("__x")).otherwise(0.0)).as(s"sx$t"),
      sum(when(col("__g") === grp, col("__y") * col("__y"))
        .otherwise(0.0)).as(s"syy$t"),
      sum(when(col("__g") === grp, col("__x") * col("__x"))
        .otherwise(0.0)).as(s"sxx$t"),
      sum(when(col("__g") === grp, col("__x") * col("__y"))
        .otherwise(0.0)).as(s"sxy$t"))
    val cols = side(groupA, "a") ++ side(groupB, "b")
    val m = base.agg(cols.head, cols.tail: _*)
      .withColumn("n_a",
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "cuped: empty sample — both groups need rows")))
          .otherwise(col("n_a")))
    def d(c: Column) = c.cast("double")
    // pooled moments (sums of per-side exact sums — still exact for
    // integral inputs)
    val withPooled = m
      .withColumn("nn", col("n_a") + col("n_b"))
      .withColumn("sx", col("sxa") + col("sxb"))
      .withColumn("sy", col("sya") + col("syb"))
      .withColumn("sxx", col("sxxa") + col("sxxb"))
      .withColumn("syy", col("syya") + col("syyb"))
      .withColumn("sxy", col("sxya") + col("sxyb"))
      .withColumn("xbar", col("sx") / d(col("nn")))
      .withColumn("varx",
        (col("sxx") - col("sx") * col("sx") / d(col("nn")))
          / d(col("nn") - 1))
      .withColumn("vary",
        (col("syy") - col("sy") * col("sy") / d(col("nn")))
          / d(col("nn") - 1))
      .withColumn("covxy",
        (col("sxy") - col("sx") * col("sy") / d(col("nn")))
          / d(col("nn") - 1))
      .withColumn("theta",
        when(col("varx") <= 0.0, lit(null).cast("double"))
          .otherwise(col("covxy") / col("varx")))
      .withColumn("rho2",
        when(col("varx") <= 0.0 || col("vary") <= 0.0,
          lit(null).cast("double"))
          .otherwise(col("covxy") * col("covxy")
            / (col("varx") * col("vary"))))
    // per-group raw and adjusted means/variances, all lazily guarded
    def grp(t: String) = {
      val n = col(s"n_$t")
      val mean = col(s"sy$t") / d(n)
      val meanX = col(s"sx$t") / d(n)
      val varY = when(n >= 2,
        (col(s"syy$t") - col(s"sy$t") * col(s"sy$t") / d(n)) / d(n - 1))
      val varX = when(n >= 2,
        (col(s"sxx$t") - col(s"sx$t") * col(s"sx$t") / d(n)) / d(n - 1))
      val covG = when(n >= 2,
        (col(s"sxy$t") - col(s"sx$t") * col(s"sy$t") / d(n)) / d(n - 1))
      (mean, meanX, varY, varX, covG)
    }
    val (meanA, meanXA, varYA, varXA, covA) = grp("a")
    val (meanB, meanXB, varYB, varXB, covB) = grp("b")
    def adjMean(mean: Column, meanX: Column) =
      mean - col("theta") * (meanX - col("xbar"))
    def adjVar(varY: Column, varX: Column, covG: Column) =
      varY - lit(2.0) * col("theta") * covG +
        col("theta") * col("theta") * varX
    def welch(ma: Column, mb: Column, va: Column, vb: Column) = {
      val se2 = va / d(col("n_a")) + vb / d(col("n_b"))
      when(se2.isNull || se2 <= 0.0, lit(null).cast("double"))
        .otherwise((ma - mb) / sqrt(se2))
    }
    withPooled.select(col("n_a"), col("n_b"), col("theta"), col("rho2"),
      adjMean(meanA, meanXA).as("mean_adj_a"),
      adjMean(meanB, meanXB).as("mean_adj_b"),
      welch(meanA, meanB, varYA, varYB).as("t_raw"),
      welch(adjMean(meanA, meanXA), adjMean(meanB, meanXB),
        adjVar(varYA, varXA, covA), adjVar(varYB, varXB, covB))
        .as("t_adj"))
  }
}
