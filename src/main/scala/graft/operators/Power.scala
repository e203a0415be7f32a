package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum detectable effect (classic two-sample power analysis — Cohen
  * 1988 ch. 2; the fixed-n inversion every experimentation platform
  * ships) — the question to ask BEFORE an A/B read, not after: "at these
  * group sizes and this metric variance, how small a shift could this
  * comparison even detect?" A curation A/B whose MDE exceeds any
  * plausible effect is theater; this makes that a one-row query.
  * Complements the TwoSample family (which answers "did it move?") and
  * x140 CUPED (whose variance reduction shrinks exactly this number).
  * No reference analog (`operators.py:80`); SURVEY §2c extension.
  */
object Power {

  /** z quantiles for the conventional designs, as shared literals: the
    * normal inverse CDF has no portable SQL spelling, and these five
    * cover the designs anyone actually runs. The α and power tables are
    * SEPARATE maps on purpose — a single shared map would let a swapped
    * design like (0.90, 0.05) pass validation and silently use a power
    * quantile as z_{1−α/2}. */
  val AlphaZ: Map[Double, Double] = Map(
    0.10 -> 1.6448536269514722, // z_{0.95}  (two-sided α = 0.10)
    0.05 -> 1.959963984540054, // z_{0.975} (two-sided α = 0.05)
    0.01 -> 2.5758293035489004) // z_{0.995} (two-sided α = 0.01)

  val PowerZ: Map[Double, Double] = Map(
    0.80 -> 0.8416212335729143, // z_{0.80}  (power 80%)
    0.90 -> 1.2815515655446004) // z_{0.90}  (power 90%)

  /** One row per requested `(alpha, power)` design:
    * `(alpha, power, n_a, n_b, mde_abs, mde_rel)` — the smallest true
    * mean difference the two-sample z test detects with the given power:
    * `MDE = (z_{1−α/2} + z_{power}) · √(var_a/n_a + var_b/n_b)`, with
    * `mde_rel` relative to group A's mean (NULL when that mean is 0 —
    * "percent of zero" is not a number). Variances come from ONE
    * conditional-moments pass over the two groups (map-side partials);
    * the designs are a literal-row frame crossed against the 1-row
    * moment artifact. NULL metrics and empty groups fail loudly; MDE is
    * NULL when either group has n < 2 (no variance estimate).
    *
    * Determinism: moment sums exact for integral metrics; the z
    * quantiles are shared 17-digit literals; the remaining arithmetic is
    * a fixed IEEE expression (gate pins round6). */
  def minimumDetectableEffect(df: DataFrame, groupCol: String,
                              valueCol: String, groupA: String,
                              groupB: String,
                              designs: Seq[(Double, Double)]): DataFrame = {
    require(groupA != groupB, s"groups must differ, got $groupA")
    require(designs.nonEmpty, "at least one (alpha, power) design")
    designs.foreach { case (a, p) =>
      require(AlphaZ.contains(a) && PowerZ.contains(p),
        s"unsupported design ($a, $p) — supported α: 0.10/0.05/0.01, " +
          "power: 0.80/0.90 (the normal inverse CDF has no portable SQL " +
          "spelling, so designs are pinned literals; a design like " +
          "(0.90, 0.05) with the slots swapped is rejected, not reordered)")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val g = when(col(groupCol).isNull || col(valueCol).isNull,
        raise_error(lit(s"mde: NULL $groupCol/$valueCol — drop or impute " +
          "upstream")))
      .otherwise(col(groupCol))
    val v = col(valueCol).cast("double")
    val m = df.select(g.as("__g"), v.as("__v"))
      .filter(col("__g").isin(groupA, groupB))
      .agg(
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__g") === groupA, col("__v")).otherwise(0.0))
          .as("__sa"),
        sum(when(col("__g") === groupB, col("__v")).otherwise(0.0))
          .as("__sb"),
        sum(when(col("__g") === groupA, col("__v") * col("__v"))
          .otherwise(0.0)).as("__qa"),
        sum(when(col("__g") === groupB, col("__v") * col("__v"))
          .otherwise(0.0)).as("__qb"))
      .select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "mde: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"), col("__sa"), col("__sb"), col("__qa"), col("__qb"))
    val plans = designs.map { case (a, p) =>
      (a, p, AlphaZ(a) + PowerZ(p))
    }.toDF("alpha", "power", "__zsum")
    plans.crossJoin(broadcast(m))
      .withColumn("__se2",
        when(col("n_a") >= 2 && col("n_b") >= 2,
          ((col("__qa") - col("__sa") * col("__sa")
              / col("n_a").cast("double"))
            / (col("n_a") - 1).cast("double") / col("n_a").cast("double"))
            + ((col("__qb") - col("__sb") * col("__sb")
              / col("n_b").cast("double"))
              / (col("n_b") - 1).cast("double")
              / col("n_b").cast("double"))))
      .withColumn("mde_abs",
        when(col("__se2").isNull || col("__se2") < 0.0,
          lit(null).cast("double"))
          .otherwise(col("__zsum") * sqrt(col("__se2"))))
      .withColumn("mde_rel",
        when(col("mde_abs").isNull
            || col("__sa") === 0.0, lit(null).cast("double"))
          .otherwise(col("mde_abs")
            / (col("__sa") / col("n_a").cast("double"))))
      .select("alpha", "power", "n_a", "n_b", "mde_abs", "mde_rel")
  }
}
