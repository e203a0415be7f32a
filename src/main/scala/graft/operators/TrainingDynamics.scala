package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-dynamics data curation: per-example statistics computed from a
  * model's behavior ACROSS training epochs (or checkpoints), used to map a
  * dataset into easy / ambiguous / hard regions and to prioritize which
  * examples are worth training on at all.
  *
  * Two public methods, two public papers:
  *
  *  - [[cartography]] — Swayamdipta et al., EMNLP 2020 ("Dataset
  *    Cartography: Mapping and Diagnosing Datasets with Training
  *    Dynamics"): confidence = mean true-class probability over epochs,
  *    variability = population std of that probability, correctness =
  *    fraction of epochs the example was classified right. High-conf /
  *    low-var = easy-to-learn; low-conf / low-var = hard-to-learn (the
  *    paper's mislabel candidates); high-var = ambiguous (the region that
  *    generalizes best).
  *  - [[rhoLossSelect]] — Mindermann et al., ICML 2022 ("Prioritized
  *    Training on Points that are Learnable, Worth Learning, and Not Yet
  *    Learnt"): reducible holdout loss = training-model loss − holdout
  *    ("irreducible") model loss; per batch, train on the top-k examples
  *    by reducible loss. Points with high training loss but ALSO high
  *    irreducible loss (noise) and points with low training loss (already
  *    learnt) both rank low.
  *
  * The reference system has no analog (its 218-line surface delegates to
  * Postgres, `/root/reference/src/operators.py`); these extend the
  * selection tier next to [[Selection]] and [[Curriculum]].
  *
  * Scale: cartography is ONE hash aggregation keyed by the example id —
  * sums/counts partial-aggregate map-side, the shuffle carries
  * `(id, n, Σp, Σp², Σcorrect)` fixed-width rows, never per-epoch rows.
  * Variability uses the one-pass closed form `sqrt(Σp²/n − mean²)`
  * (clamped at 0 for ulp-negative arguments). rhoLossSelect is per-row
  * arithmetic + the bounded-heap [[Selection.topKPerGroup]] — shuffle
  * bounded at `groups × partitions × k`, no sort, no window.
  *
  * Determinism: double sums commute up to ulps; gate entries feed
  * exact-integer-derived probabilities and canonicalize round4 (the
  * repo's k-term double-sum contract). Region flags compare the ROUNDED
  * statistics so a flag can never straddle its threshold (the x93
  * lesson). */
object TrainingDynamics {

  /** Per-example training-dynamics map. Input: one row per (example,
    * epoch) with the model's true-class probability that epoch. Output:
    * one row per example — `n_epochs`, `confidence` (mean p),
    * `variability` (population std of p), `correctness` (fraction of
    * epochs with p ≥ 0.5), and `region`:
    * `easy` (conf ≥ confSplit, var < varSplit), `hard` (conf < confSplit,
    * var < varSplit), `ambiguous` (var ≥ varSplit). The paper draws the
    * splits at dataset-relative positions; fixed thresholds keep the
    * operator a single pass — feed quantile-derived values (e.g. from
    * [[Percentiles]]) when dataset-relative splits are wanted.
    *
    * The region test uses round4(conf)/round4(var) so the label is a
    * deterministic function of the CANONICALIZED statistics — an ulp of
    * drift in the raw double can never flip a label across the split.
    * NULL probabilities are skipped by the sums (epochs where the example
    * wasn't scored); an example whose probabilities are ALL NULL reports
    * NULL statistics and NULL region, never NaN. */
  def cartography(df: DataFrame, idCol: String, probCol: String,
                  confSplit: Double = 0.5,
                  varSplit: Double = 0.2): DataFrame = {
    require(confSplit > 0.0 && confSplit < 1.0,
      s"confSplit must be in (0, 1), got $confSplit")
    require(varSplit > 0.0, s"varSplit must be > 0, got $varSplit")
    val p = col(probCol).cast("double")
    val round4 = (c: Column) => floor(c * 10000 + 0.5) / 10000
    val agg = df.groupBy(idCol).agg(
      count(p).as("n_epochs"),
      sum(p).as("__s"),
      sum(p * p).as("__s2"),
      // NULL p contributes NULL (sum-skipped), matching the count(p)
      // denominator — NOT otherwise(0), which would count an unscored
      // epoch as "wrong"
      sum(when(p.isNull, lit(null).cast("long"))
        .when(p >= 0.5, 1L).otherwise(0L)).as("__c"))
    val n = col("n_epochs").cast("double")
    val conf = col("__s") / n
    // greatest() skips NULLs, so an all-NULL example's NULL−NULL argument
    // would silently become 0.0 and sqrt to 0 — gate the whole expression
    // on the sum instead so the stats stay NULL together
    val variab = when(col("__s").isNull, lit(null).cast("double"))
      .otherwise(sqrt(greatest(col("__s2") / n - conf * conf, lit(0.0))))
    agg.select(col(idCol), col("n_epochs"),
        conf.as("confidence"), variab.as("variability"),
        (col("__c").cast("double") / n).as("correctness"))
      .withColumn("region",
        when(col("confidence").isNull, lit(null).cast("string"))
          .when(round4(col("variability")) >= varSplit, lit("ambiguous"))
          .when(round4(col("confidence")) >= confSplit, lit("easy"))
          .otherwise(lit("hard")))
  }

  /** Reducible-holdout-loss selection: per `groupCols` cell (a batch, a
    * source, a shard), the k examples with the largest
    * `reducible = trainLoss − irreducibleLoss`, ranked descending with
    * ties broken by id (descending, the [[Selection.topKPerGroup]]
    * contract). Output: `groupCols ++ (rank, reducible_loss, idCol)` —
    * the narrow frame; join back on the id for payloads. Rows where
    * either loss is NULL are skipped (unscored examples can't be
    * prioritized). */
  def rhoLossSelect(df: DataFrame, idCol: String, trainLossCol: String,
                    irreducibleLossCol: String, groupCols: Seq[String],
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reducible = col(trainLossCol).cast("double") -
      col(irreducibleLossCol).cast("double")
    val narrow = df.withColumn("__reducible", reducible)
    Selection.topKPerGroup(narrow, groupCols, "__reducible", idCol, k)
      .withColumnRenamed("__reducible", "reducible_loss")
  }

  /** Confident-learning label-noise flags for a binary-labeled corpus
    * [Northcutt, Jiang & Chuang, JAIR 2021 — "Confident Learning:
    * Estimating Uncertainty in Dataset Labels"; the cleanlab method]:
    * per-class confidence thresholds `t_j` = mean predicted probability of
    * class j among examples LABELED j; an example is a suspected label
    * error when its probability of the OPPOSITE class reaches that class's
    * threshold — the model is as confident in the other class as it
    * typically is when the other class is the given label. The screening
    * pass before burning annotation budget on re-labeling (or before
    * trusting a quality-classifier's training labels at all).
    *
    * `probCol` is P(class 1); P(class 0) = 1 − p. Output: every input row
    * plus `suspect` (boolean) and `suggested_label` (the opposite class
    * when suspect, else NULL). The comparison uses the ROUNDED (round4)
    * thresholds so an ulp of sum-order drift in the class means can never
    * flip a flag (the straddle-proof convention). Labels must be 0/1 and
    * probabilities in [0, 1] — validated in-scan, fail-loud; a class with
    * no labeled examples has a NULL threshold and flags nothing as that
    * class.
    *
    * Scale: ONE aggregation for the two class means (a 1-row broadcast
    * artifact) + a map-only flag pass — nothing beyond the two scans. */
  def confidentLearningFlags(df: DataFrame, idCol: String, labelCol: String,
                             probCol: String): DataFrame = {
    val p = col(probCol).cast("double")
    val pg = when(p >= 0.0 && p <= 1.0, p)
      .otherwise(raise_error(lit(
        s"confidentLearningFlags: '$probCol' must be in [0, 1]")))
    val lbl = col(labelCol).cast("long")
    val lg = when(lbl === 0L || lbl === 1L, lbl)
      .otherwise(raise_error(lit(
        s"confidentLearningFlags: label column '$labelCol' must be 0/1")))
    val round4 = (c: Column) => floor(c * 10000 + 0.5) / 10000
    val base = df.withColumn("__p", pg).withColumn("__y", lg)
    val thresholds = base.agg(
      round4(avg(when(col("__y") === 1L, col("__p")))).as("__t1"),
      round4(avg(when(col("__y") === 0L, lit(1.0) - col("__p")))).as("__t0"))
    base.crossJoin(broadcast(thresholds))
      .withColumn("suspect",
        when(col("__y") === 0L,
          col("__t1").isNotNull && col("__p") >= col("__t1"))
          .otherwise(
            col("__t0").isNotNull && (lit(1.0) - col("__p")) >= col("__t0")))
      .withColumn("suggested_label",
        when(col("suspect"), lit(1L) - col("__y")))
      .drop("__p", "__y", "__t0", "__t1")
  }
}
