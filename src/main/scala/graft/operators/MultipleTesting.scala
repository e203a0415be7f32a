package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benjamini-Hochberg false-discovery-rate selection (Benjamini & Hochberg
  * 1995, JRSS-B 57) — the multiple-testing gate a pipeline needs the moment
  * it screens MILLIONS of candidates with a per-item p-value (contamination
  * hits, drift alarms per source, label-noise flags, classifier
  * discoveries): a fixed per-test cutoff either drowns in false positives
  * (α·m of them) or, Bonferroni-corrected, rejects nothing. BH picks the
  * largest k with `p_(k) ≤ (k/m)·α` and keeps everything below that
  * p-value, controlling the EXPECTED FRACTION of false discoveries at α
  * among independent (or positively dependent) tests. Complements the
  * threshold family: x102 picks thresholds FOR a precision target on
  * labeled data, x124 conformal calibrates pass rates — BH needs only the
  * p-values themselves. No reference analog (`operators.py:80` delegates
  * to Postgres); SURVEY §2c extension.
  */
object MultipleTesting {

  private def guarded(df: DataFrame, pCol: String) =
    df.withColumn("__p",
      when(col(pCol).isNull || col(pCol).cast("double") < 0.0
          || col(pCol).cast("double") > 1.0,
        raise_error(lit(s"benjaminiHochberg: $pCol must be a non-NULL " +
          "p-value in [0, 1] — a silent bad p corrupts the FDR guarantee")))
        .otherwise(col(pCol).cast("double")))

  /** The BH step-up threshold: one row `(m, threshold, n_rejected)` —
    * `threshold` is the largest p with `p·m ≤ rank·α` (NULL, with
    * `n_rejected = 0`, when no p qualifies), `m` the test count. Because
    * the step-up condition is monotone in rank at fixed p, only the
    * LARGEST rank per distinct p matters — which is exactly the cumulative
    * count from the distinct-value trick, so the whole procedure is one
    * p-keyed count shuffle + a cumulative window over DISTINCT p values
    * (cardinality-bounded, not corpus-bounded) + a 2-row-ish final
    * aggregate. No global row sort.
    *
    * Determinism: ranks and m are exact integers; the qualifying
    * comparison `p·m ≤ rank·α` is two IEEE multiplies spelled identically
    * cross-engine, and the returned threshold is a DATA VALUE — no
    * accumulated float error anywhere. */
  def bhThreshold(df: DataFrame, pCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1): $alpha")
    val p = guarded(df, pCol).select("__p")
    val cum = p.groupBy("__p").agg(count(lit(1)).as("__c"))
      .withColumn("__rank", sum("__c").over(
        Window.orderBy("__p")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val m = p.agg(count(lit(1)).as("m"))
    val qualified = cum.crossJoin(broadcast(m))
      .withColumn("__ok",
        col("__p") * col("m").cast("double")
          <= col("__rank").cast("double") * lit(alpha))
    qualified.groupBy("m")
      .agg(max(when(col("__ok"), col("__p"))).as("threshold"))
      .join(
        qualified.select(col("__p").as("__p2"), col("__c").as("__c2")),
        col("__p2") <= col("threshold"), "left")
      .groupBy("m", "threshold")
      .agg(coalesce(sum("__c2"), lit(0L)).as("n_rejected"))
  }

  /** Flags each row with `bh_keep` — true iff its p-value is at or below
    * the [[bhThreshold]] cutoff (all-false when nothing qualifies). One
    * broadcast of the 1-row threshold artifact + a map-only comparison on
    * the corpus; the heavy lifting is the threshold's distinct-p window. */
  def benjaminiHochberg(df: DataFrame, pCol: String,
                        alpha: Double): DataFrame = {
    val thr = bhThreshold(df, pCol, alpha)
      .select(col("threshold").as("__bh_thr"))
    guarded(df, pCol).crossJoin(broadcast(thr))
      .withColumn("bh_keep",
        col("__bh_thr").isNotNull && col("__p") <= col("__bh_thr"))
      .drop("__p", "__bh_thr")
  }
}
