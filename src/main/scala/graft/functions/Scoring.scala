package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-inference scoring (SURVEY.md §2c): apply an externally-trained
  * linear classifier (fasttext-style quality model, LR spam filter) to every
  * document as ONE codegen'd per-row expression.
  *
  * The reference has no model serving; its quality gate is SQL thresholds
  * (`/root/reference/src/airflow_postgres_csv/operators.py:80` delegates the
  * WHERE clause to Postgres). A training-data pipeline's kept/dropped gate is
  * usually a trained linear model over cheap features — the inference step is
  * a dot product, which belongs INSIDE the scan-side expression pipeline,
  * not in a UDF or an external service call.
  *
  * Scale: map-only, fuses with the parquet scan, no shuffle, no UDF. The
  * margin is built with a FIXED left-to-right fold, so the IEEE op sequence
  * is deterministic and reproducible cross-engine (same rationale as the
  * log-free TF-IDF in [[graft.operators.Relevance]]).
  */
object Scoring {

  /** bias + Σ wᵢ·fᵢ, folded left-to-right — a fixed IEEE sequence. */
  def linearMargin(features: Seq[(Column, Double)], bias: Double): Column =
    features.foldLeft(lit(bias): Column) { case (acc, (f, w)) => acc + f * lit(w) }

  /** Attach a margin and a kept/dropped decision from feature COLUMNS already
    * on the frame (the features stay inspectable — pipelines audit what the
    * model saw). `weights` pairs column name → coefficient. */
  def applyLinearModel(df: DataFrame, weights: Seq[(String, Double)],
                       bias: Double, threshold: Double = 0.0,
                       scoreCol: String = "margin",
                       keepCol: String = "keep"): DataFrame = {
    val margin = linearMargin(weights.map { case (c, w) => (col(c), w) }, bias)
    df.withColumn(scoreCol, margin)
      .withColumn(keepCol, col(scoreCol) > threshold)
  }
}
