package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal quantile thresholds (Vovk et al.; Papadopoulos 2002) —
  * the distribution-free selection gate: pick a cutoff on ANY exchangeable
  * score (toxicity, LM loss, dedup distance) from a calibration sample so
  * that `P(s_new ≤ q̂) ≥ 1 − α` holds with NO model or distribution
  * assumption. The pipeline use: calibrate a filter threshold on a labeled
  * slice, then apply it to the 100 TB remainder with a guaranteed
  * pass-through rate. No reference analog (`operators.py:80` delegates to
  * Postgres); SURVEY §2c extension territory, sibling of the calibration
  * members (x82 bins, x105 isotonic, x102 precision thresholds).
  */
object Conformal {

  private def scores(df: DataFrame, scoreCol: String): DataFrame =
    df.select(
      when(col(scoreCol).isNull,
        raise_error(lit("conformal: NULL score — drop or impute upstream, " +
          "a silent NULL would break exchangeability accounting")))
        .otherwise(col(scoreCol).cast("double")).as("__s"))

  /** For each `alpha`, the finite-sample-corrected conformal threshold:
    * the `⌈(n+1)(1−α)⌉`-th smallest calibration score, or NULL when that
    * rank exceeds n (the guarantee is unattainable at this α and
    * calibration size — fail-honest, not +∞).
    *
    * Shape: one score-keyed count shuffle, then a cumulative window over
    * DISTINCT score values (cardinality-bounded — quantize continuous
    * scores upstream if their distinct count rivals the corpus), then a
    * broadcast |alphas|-row rank probe. Order statistics over duplicated
    * values are well-defined (k-th smallest VALUE), so ties cost nothing.
    *
    * Determinism: thresholds are DATA VALUES picked by integer-rank
    * comparison — exactly reproducible; the only float op is the rank
    * formula `ceil((n+1)(1−α))`, one IEEE multiply+ceil spelled
    * identically cross-engine. */
  def quantileThresholds(cal: DataFrame, scoreCol: String,
                         alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0.0 && a < 1.0),
      s"alphas must be in (0, 1), got $alphas")
    val spark = cal.sparkSession
    import spark.implicits._
    val s = scores(cal, scoreCol)
    val cum = s.groupBy("__s").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(
        Window.orderBy("__s")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val n = s.agg(count(lit(1)).as("n_cal"))
    val ks = alphas.toDF("alpha").crossJoin(broadcast(n))
      .select(col("alpha"), col("n_cal"),
        ceil((col("n_cal") + 1) * (lit(1.0) - col("alpha")))
          .cast("long").as("k"))
    ks.join(cum, col("__cum") >= col("k"), "left")
      .groupBy("alpha", "n_cal", "k")
      .agg(min("__s").as("threshold"))
  }

  /** Empirical coverage of `thresholds` (from [[quantileThresholds]]) on a
    * held-out frame: per α, the fraction of test scores ≤ threshold, plus a
    * self-validating `meets_guarantee` flag at 3 binomial sigmas below the
    * nominal 1−α (the conformal guarantee is marginal over resamples; a
    * single split carries √(α(1−α)/m) noise). A NULL threshold propagates
    * NULL coverage and NULL flag — unattainable, not silently zero.
    *
    * Shape: one broadcast of the |alphas|-row threshold frame into a
    * map-side conditional count — a single pass over the test scores. */
  def coverage(test: DataFrame, scoreCol: String,
               thresholds: DataFrame): DataFrame = {
    val s = scores(test, scoreCol)
    s.crossJoin(broadcast(thresholds))
      .groupBy("alpha", "n_cal", "k", "threshold")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("threshold").isNotNull && col("__s") <= col("threshold"),
            1L)
          .when(col("threshold").isNotNull, 0L)).as("__cov"))
      .select(col("alpha"), col("n_cal"), col("k"), col("threshold"),
        col("n_test"),
        (col("__cov").cast("double") / col("n_test")).as("test_coverage"))
      .withColumn("meets_guarantee",
        col("test_coverage") >= lit(1.0) - col("alpha")
          - lit(3.0) * sqrt(col("alpha") * (lit(1.0) - col("alpha"))
            / col("n_test")))
  }
}
