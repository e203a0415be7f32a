package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting — learn the MIXTURE, not just sample
  * it: alternate (a) refitting a small linear proxy (the
  * [[LogisticRegression]] quality classifier) under the current domain
  * weights and (b) an exponentiated-gradient (Group-DRO) update that
  * upweights domains where the proxy still loses vs a fixed reference
  * model. After T steps the weights concentrate on the domains the proxy
  * finds hard-but-learnable — the published recipe for choosing
  * pretraining mixture proportions with a tiny model before burning
  * compute on the big one (Xie et al., "DoReMi", NeurIPS 2023; Sagawa et
  * al., Group DRO, ICLR 2020). The reference system has no analog
  * (operators.py delegates everything to Postgres); this extends the X6
  * sampling surface: [[Sampling.temperatureMixture]] reshapes counts by a
  * FORMULA, this learns the proportions from losses.
  *
  * Algorithm (per-domain state only):
  *   ref    = trainWeighted(df, ω ≡ 1)                 — fixed baseline
  *   w⁰     = uniform over the K domains
  *   step t = 1..steps:
  *     θᵗ       = trainWeighted(df, ωᵢ = w(dᵢ)/share(dᵢ))   — proxy refit
  *     excessₖ  = max(0, Lₖ(θᵗ) − Lₖ(ref))                  — per-domain
  *     wₖ       ∝ wₖ · exp(η · excessₖ), renormalized        — driver EG
  *
  * Distribution: every training pass is the [[LogisticRegression]] shape
  * (ONE partial aggregation per GD step over a cached narrow projection,
  * driver state O(features × partitions)); the per-domain losses come
  * from ONE (domain, partition)-keyed aggregation whose ≤ K·P rows are
  * folded on the driver in sorted (domain, pid) order — bit-deterministic
  * for a fixed partitioning, like every driver fold here. The per-example
  * weight is a K-branch codegen'd when-chain (no join, no shuffle); EG
  * state is K doubles. Nothing anywhere scales with corpus size except
  * the scans, so the loop holds at 100 TB exactly as far as the trainer
  * does. K is expected to be model-artifact sized (sources/languages,
  * tens to thousands); the when-chain and the K·P driver fold both assume
  * that.
  *
  * Determinism: fixed input partitioning → bit-deterministic weights (the
  * proxy losses, the domain folds, and the EG arithmetic are all fixed
  * finite sequences of double ops). Excess loss is clamped at 0, so
  * weights can only move toward harder domains; a corpus the reference
  * already fits perfectly leaves the mixture uniform. */
object MixtureOptimization {

  final case class DomainWeight(domain: String, nDocs: Long, refLoss: Double,
                                finalLoss: Double, excess: Double,
                                weight: Double)

  final case class DoremiResult(weights: Seq[DomainWeight],
                                refModel: LogisticRegression.LogRegModel,
                                finalModel: LogisticRegression.LogRegModel) {
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      weights.toDF("domain", "n_docs", "ref_loss", "final_loss",
        "excess", "weight")
    }
  }

  /** Run the reweighting loop over `df`. `domainCol` must be a string
    * column with model-artifact-sized cardinality; `featureCols`/`labelCol`
    * feed the proxy exactly as [[LogisticRegression.train]]. Returns the
    * per-domain weights (sorted by domain for a stable artifact) plus both
    * proxy models. NULL domains fail loudly — impute upstream. */
  def doremiWeights(df: DataFrame, domainCol: String,
                    featureCols: Seq[String], labelCol: String,
                    steps: Int = 3, eta: Double = 1.0,
                    itersPerStep: Int = 10, lr: Double = 1.0,
                    maxDomains: Int = 10000): DoremiResult = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(eta > 0, s"eta must be positive, got $eta")
    require(maxDomains >= 1, s"maxDomains must be >= 1, got $maxDomains")
    val spark = df.sparkSession

    // narrow projection cached ONCE for the whole loop: every refit and
    // every loss pass re-projects from it instead of rescanning the corpus
    val narrow = df.select(
        col(domainCol).cast("string").as("__d") +:
          col(labelCol).cast("double").as("__y") +:
          featureCols.zipWithIndex.map { case (c, j) =>
            col(c).cast("double").as(s"__x$j") }: _*)
      .where(col("__y").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // domain shares: the reference mixture the weights are measured
      // against (collect is K rows — a model artifact, same contract as
      // the trainer's partition sums). NULL domains surface as a NULL
      // group key in the SAME pass — one scan, still fail-loud.
      val countRows = narrow.groupBy("__d").agg(count(lit(1)).as("n"))
        .collect()
      require(!countRows.exists(_.isNullAt(0)),
        "NULL domain values — impute or drop upstream")
      val counts = countRows.map(r => r.getString(0) -> r.getLong(1))
        .sortBy(_._1)
      require(counts.length <= maxDomains,
        s"${counts.length} domains exceeds maxDomains=$maxDomains — " +
          "domain weights are a model artifact; coarsen the domain column")
      val domains = counts.map(_._1)
      val k = domains.length
      val n = counts.map(_._2).sum.toDouble
      val share = counts.map { case (_, c) => c / n }.toArray
      val xCols = featureCols.indices.map(j => s"__x$j")

      val ref = LogisticRegression.trainWeighted(narrow, xCols, "__y",
        lit(1.0), iters = itersPerStep, lr = lr)
      val refLoss = domainLosses(narrow, domains, xCols, ref)

      var w = Array.fill(k)(1.0 / k)
      var model = ref
      var excess = Array.fill(k)(0.0)
      var lastLoss = refLoss
      (1 to steps).foreach { _ =>
        // per-example importance weight w(d)/share(d): a FLAT literal-map
        // lookup (element_at over map_from_arrays of two array literals) —
        // unlike a K-deep when/otherwise chain, the expression tree depth
        // is constant in K, so Catalyst analysis never stack-overflows at
        // the maxDomains cap. Every __d is in the map by construction
        // (domains = the observed group keys of this same frame).
        val wOf = element_at(
          map_from_arrays(
            typedlit(domains.toSeq),
            typedlit(Array.tabulate(k)(i => w(i) / share(i)).toSeq)),
          col("__d"))
        model = LogisticRegression.trainWeighted(narrow, xCols, "__y",
          wOf, iters = itersPerStep, lr = lr)
        lastLoss = domainLosses(narrow, domains, xCols, model)
        excess = Array.tabulate(k)(i => math.max(0.0, lastLoss(i) - refLoss(i)))
        val unnorm = Array.tabulate(k)(i => w(i) * math.exp(eta * excess(i)))
        val z = unnorm.sum
        w = unnorm.map(_ / z)
      }
      DoremiResult(
        domains.indices.map(i => DomainWeight(domains(i), counts(i)._2,
          refLoss(i), lastLoss(i), excess(i), w(i))).toSeq,
        ref, model)
    } finally narrow.unpersist(false)
  }

  /** Per-domain mean log-loss of a fitted proxy over the narrow frame:
    * ONE (domain, partition)-keyed aggregation, ≤ K·P rows collected and
    * folded in sorted (domain, pid) order — bit-deterministic for a fixed
    * partitioning, driver state K·P doubles. */
  private def domainLosses(narrow: DataFrame, domains: Array[String],
                           xCols: Seq[String],
                           m: LogisticRegression.LogRegModel): Array[Double] = {
    val margin = m.weights.foldLeft(lit(m.bias): Column) {
      case (acc, (c, wj)) => acc + lit(wj) * col(c)
    }
    val lossRow = greatest(margin, lit(0.0)) - col("__y") * margin +
      log1p(exp(-abs(margin)))
    val rows = narrow
      .groupBy(col("__d"), spark_partition_id().as("__pid"))
      .agg(sum(lossRow).as("__l"), count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val idx = domains.zipWithIndex.toMap
    val sums = Array.fill(domains.length)(0.0)
    val ns = Array.fill(domains.length)(0L)
    rows.foreach { case (d, _, l, c) =>
      val i = idx(d); sums(i) += l; ns(i) += c
    }
    Array.tabulate(domains.length)(i =>
      if (ns(i) == 0) 0.0 else sums(i) / ns(i))
  }

  /** UniMax token-budget allocation (Chung et al., ICLR 2023 — "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): split a total training-token budget `B`
    * across languages so every language trains as uniformly as possible
    * WITHOUT repeating any language more than `maxEpochs` times. The
    * waterfilling rule: process languages by available-token count
    * ascending; each gets `min(cap, fairShare)` where
    * `cap = maxEpochs · n_tokens` and `fairShare` is the remaining budget
    * split evenly over the remaining languages. Low-resource languages hit
    * their epoch cap and release budget to the rest; high-resource
    * languages end at a common equal share — the UNIFORM part of UniMax.
    *
    * Closed form instead of a sequential loop: with languages sorted by
    * `(cap, lang)` ascending (row i of L, exclusive prefix cap sum Sᵢ),
    * language i is capped iff `capᵢ · (L − i + 1) ≤ B − Sᵢ` — an EXACT
    * comparison evaluated in decimal(38,0), no doubles anywhere in the
    * decision and no 64-bit wrap either (the product and the prefix sums
    * can exceed 2⁶³ at large counts × maxEpochs × many languages). The capped
    * set is a prefix of the sorted order (caps ascending ⇒ once the fair
    * share undercuts a cap it undercuts all larger ones); the code pins
    * that invariant with a running MIN over the indicator rather than
    * assuming it. Uncapped languages share
    * `t = (B − Σ capped caps) / (#uncapped)` — the single double division,
    * spelled once.
    *
    * Output, one row per language: `n_tokens`, `cap`, `capped`,
    * `allocated` (double; == cap exactly when capped), `epochs`
    * (= allocated / n_tokens). If `Σ caps ≤ B` every language is capped
    * and `Σ allocated < B` — UniMax leaves budget on the table rather
    * than over-repeating (the paper's choice); callers wanting full
    * spend raise `maxEpochs`.
    *
    * Scale: `counts` is the PER-LANGUAGE aggregate (a model artifact,
    * tens–thousands of rows), never the corpus — the O(L) global windows
    * here are windows over that artifact. The corpus-sized work (counting
    * tokens per language) happens upstream as one hash aggregation.
    * Integer caps/prefixes are exact; `allocated`/`epochs` are fixed IEEE
    * expressions of them. NULL or negative token counts fail loudly. */
  def unimaxAllocation(counts: DataFrame, langCol: String, tokensCol: String,
                       budget: Long, maxEpochs: Long): DataFrame = {
    require(budget > 0L, s"budget must be > 0, got $budget")
    require(maxEpochs >= 1L, s"maxEpochs must be >= 1, got $maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val guarded = counts.select(col(langCol),
      when(col(tokensCol).isNull || col(tokensCol) < 0,
        raise_error(lit("unimaxAllocation: NULL or negative token count")))
        .otherwise(col(tokensCol).cast("long")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
    // O(L) frame: single-partition windows over the language artifact only
    val w = Window.orderBy(col("cap"), col(langCol))
    // the capped test and the prefix sums run in decimal(38,0): cap·(L−i+1)
    // and Σcap are products/sums of longs that can exceed 2⁶³ (huge
    // per-language counts × maxEpochs × many languages) — Long arithmetic
    // would silently wrap and flip a capping decision; decimal keeps the
    // decision exact to 38 digits (the isotonicCalibrate discipline)
    val capDec = col("cap").cast("decimal(38,0)")
    val ranked = guarded
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__sprev",
        coalesce(sum(capDec).over(
          w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L).cast("decimal(38,0)")))
      .withColumn("__l", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).cast("long"))
      .withColumn("__ind",
        when(capDec * (col("__l") - col("__i") + 1L).cast("decimal(38,0)") <=
          lit(budget).cast("decimal(38,0)") - col("__sprev"), 1).otherwise(0))
      // prefix invariant, pinned: capped = min(indicator) over rows ≤ i
      .withColumn("capped",
        min(col("__ind")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          === 1)
    val totals = ranked.agg(
      sum(when(col("capped"), capDec)
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("__scap"),
      sum(when(col("capped"), 0L).otherwise(1L)).as("__nfree"))
    val t = (lit(budget).cast("decimal(38,0)") - col("__scap"))
      .cast("double") / col("__nfree").cast("double")
    ranked.crossJoin(broadcast(totals))
      .withColumn("allocated",
        when(col("capped"), col("cap").cast("double")).otherwise(t))
      .withColumn("epochs",
        when(col("n_tokens") > 0L,
          col("allocated") / col("n_tokens").cast("double")))
      .select(col(langCol), col("n_tokens"), col("cap"), col("capped"),
        col("allocated"), col("epochs"))
  }
}
