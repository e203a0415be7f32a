package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Data selection via importance resampling — the DSIR recipe (Xie et al.,
  * NeurIPS 2023): fit cheap bag-of-features distributions over a small
  * TARGET corpus (the domain you want more of) and the RAW crawl, weight
  * every raw document by how target-like its features are
  * (`Σ_f c_f · (ln p̂_target(f) − ln p̂_raw(f))`), then resample with
  * Gumbel-top-k so selection is proportional to the importance weights
  * rather than a hard threshold.
  *
  * Spark-first shape: the MODEL IS A DATAFRAME — a (feature, log_ratio)
  * relation built by two count aggregations and one full-outer join. At
  * 100 TB the explicit-unigram table is itself huge, so it stays a
  * distributed relation end-to-end; scoring is explode + one equi-join +
  * per-doc sum (AQE broadcasts the ratio table when it fits, degrades to a
  * shuffle join beyond — no driver collect anywhere). The [[hashedLogRatios]]
  * variant is the paper's actual scale path: features are hash buckets, so
  * the model is AT MOST `numBuckets` rows regardless of corpus size and the
  * scoring join is always broadcastable.
  *
  * Smoothing is add-one over the feature space (union vocabulary for the
  * explicit variant, all `numBuckets` buckets for the hashed one), so
  * ratios stay finite for features seen on only one side, and tokens seen
  * on NEITHER side score the well-defined OOV ratio
  * `ln((n_raw + V) / (n_target + V))` instead of being dropped.
  */
object ImportanceWeights {

  /** The fitted model: `ratios` = (feature, log_ratio), `totals` = a single
    * row (n_target, n_raw, n_features). Plain DataFrames — persist or
    * parquet round-trip them to reuse one fit across many scoring runs.
    * The model carries its own feature configuration (`ngramOrders`,
    * `hashedBuckets`) so [[score]] featurizes exactly the way the fit did —
    * fit/score feature skew is impossible by construction (the same
    * argument as [[Bpe]]'s shared pre-tokenizer). */
  final case class RatioModel(ratios: DataFrame, totals: DataFrame,
                              ngramOrders: Seq[Int],
                              hashedBuckets: Option[Int]) {

    /** `ln((1/(n_target+V)) / (1/(n_raw+V)))` — the weight of a feature
      * absent from BOTH fit corpora, derived from `totals` columns. */
    private[operators] def oovLogRatio: Column =
      log((lit(1.0) / (col("n_target") + col("n_features"))) /
        (lit(1.0) / (col("n_raw") + col("n_features"))))
  }

  /** Lowercased whitespace tokens — the corpus-wide shared tokenization
    * (same convention as [[LanguageModel]] and [[Relevance]]). */
  private def toks(textCol: String): Column =
    transform(TextAnalysis.tokens(col(textCol)), t => lower(t))

  /** Feature instances from a PRE-PROJECTED token-array attribute:
    * order-1 = the tokens themselves, order-n = space-joined runs of n
    * adjacent tokens (the DSIR paper fits hashed unigrams+bigrams). One
    * flattened array per doc — a single Generate in the plan regardless of
    * how many orders are requested.
    *
    * `ts` MUST be a projected column attribute, not the [[toks]] expression
    * inline: this expression references the token array ~4× for two orders,
    * and a Generate input gets no subexpression elimination — inlining the
    * tokenizer here re-split every document four times per pass (measured
    * ~4× on the x42c fit before the round-12 fix). CollapseProject leaves
    * the staging projection alone precisely because the alias is expensive
    * and multiply-referenced. */
  private def ngramInstances(ts: Column, orders: Seq[Int]): Column = {
    val perOrder = orders.map {
      case 1 => ts
      case n =>
        when(size(ts) >= n,
          transform(sequence(lit(1), size(ts) - (n - 1)),
            i => concat_ws(" ", slice(ts, i, lit(n)))))
          .otherwise(array().cast("array<string>"))
    }
    if (perOrder.size == 1) perOrder.head else flatten(array(perOrder: _*))
  }

  /** Hash-bucket feature: `xxhash64(token) mod numBuckets`, non-negative. */
  private def bucketOf(term: Column, numBuckets: Int): Column =
    pmod(xxhash64(term), lit(numBuckets.toLong))

  /** Shared fit: count `feature` occurrences in each corpus, full-outer
    * join, add-one smooth over a feature space of size `featureSpace`
    * (a 1-row frame column so the whole fit stays one lazy plan). */
  private def fit(target: DataFrame, raw: DataFrame, textCol: String,
                  orders: Seq[Int], hashed: Option[Int],
                  featureSpace: DataFrame => Column,
                  materialize: Boolean = false): RatioModel = {
    require(orders.nonEmpty && orders.forall(_ >= 1),
      s"ngram orders must be >= 1, got $orders")
    val feature: Column => Column = hashed match {
      case Some(b) => bucketOf(_, b)
      case None    => identity(_)
    }
    def counts(df: DataFrame, as: String): DataFrame = df
      .select(toks(textCol).as("__ts"))
      .select(explode(ngramInstances(col("__ts"), orders)).as("__t"))
      .select(feature(col("__t")).as("feature"))
      .groupBy("feature").agg(count(lit(1)).as(as))
    val joined0 = counts(target, "c_target")
      .join(counts(raw, "c_raw"), Seq("feature"), "full_outer")
      .select(col("feature"),
        coalesce(col("c_target"), lit(0L)).as("c_target"),
        coalesce(col("c_raw"), lit(0L)).as("c_raw"))
    // materialize = true (bounded hashed models only): run the two corpus
    // count aggregations exactly ONCE and let totals + ratios derive from
    // the checkpointed count table.
    val joined = if (materialize) joined0.localCheckpoint(true) else joined0
    val totals = joined.agg(
      coalesce(sum(col("c_target")), lit(0L)).as("n_target"),
      coalesce(sum(col("c_raw")), lit(0L)).as("n_raw"),
      count(lit(1)).as("n_seen"))
    val totalsWithV = totals.select(col("n_target"), col("n_raw"),
      featureSpace(totals).as("n_features"))
    // ln(p̂_t / p̂_r) spelled as the quotient of the two smoothed
    // probabilities — the exact IEEE op sequence the DuckDB oracle mirrors.
    val ratios = joined.crossJoin(broadcast(totalsWithV))
      .select(col("feature"), col("c_target"), col("c_raw"),
        log(((col("c_target") + lit(1.0)) / (col("n_target") + col("n_features"))) /
          ((col("c_raw") + lit(1.0)) / (col("n_raw") + col("n_features"))))
          .as("log_ratio"))
    RatioModel(ratios, totalsWithV, orders, hashed)
  }

  /** Explicit-unigram fit: features are the tokens themselves, the feature
    * space is the union vocabulary. Exact and oracle-checkable; the model
    * is vocabulary-sized. */
  def unigramLogRatios(target: DataFrame, raw: DataFrame,
                       textCol: String): RatioModel =
    fit(target, raw, textCol, Seq(1), None, _ => col("n_seen"))

  /** Hashed-feature fit (the DSIR paper's production shape): features are
    * `xxhash64 mod numBuckets` over the requested n-gram orders — the
    * paper fits unigrams+bigrams, `ngramOrders = Seq(1, 2)`. The feature
    * space is all `numBuckets` buckets (absent buckets smooth to 1/(N+B)
    * implicitly via the scorer's OOV path). Model size is bounded by
    * `numBuckets` — broadcastable at any corpus scale. */
  def hashedLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
                      numBuckets: Int = 1 << 20,
                      ngramOrders: Seq[Int] = Seq(1, 2)): RatioModel = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // The hashed model is ≤ numBuckets rows — a TRAINING ARTIFACT like the
    // IVF centroids and PQ codebooks, not a corpus-sized relation — so
    // this fit is EAGER (`materialize = true`): the joined count table is
    // localCheckpointed once and both the totals and the ratio table
    // derive from the checkpoint. Left lazy, score() re-executed the two
    // corpus count aggregations ~3× (ratios' own totals cross-join plus
    // the scorer's totals reference) — measured ~12.5 s vs ~1.5 s on the
    // x42c gate at sf0.1. The explicit-unigram fit stays lazy: its model
    // is vocabulary-sized and the caller owns its lifecycle.
    fit(target, raw, textCol, ngramOrders, Some(numBuckets),
      _ => lit(numBuckets.toLong), materialize = true)
  }

  /** Score documents against a fitted model: per-doc feature-instance
    * count and importance log-weight `Σ_instances log_ratio(feature)` plus
    * its per-instance mean (the length-normalized variant). Featurization
    * (n-gram orders, hashing) comes from the MODEL, so it always matches
    * the fit. Instances whose feature is absent from the model score the
    * OOV ratio; documents yielding zero instances keep n_tokens = 0 and
    * NULL weights (nothing silently drops). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: RatioModel): DataFrame = {
    val feat: Column => Column = model.hashedBuckets match {
      case Some(b) => bucketOf(_, b)
      case None    => identity(_)
    }
    val toksDf = docs
      .select(col(idCol), toks(textCol).as("__ts"))
      .select(col(idCol),
        explode(ngramInstances(col("__ts"), model.ngramOrders)).as("__t"))
      .select(col(idCol), feat(col("__t")).as("feature"))
    val scored = toksDf
      .join(model.ratios.select(col("feature"), col("log_ratio")),
        Seq("feature"), "left")
      .crossJoin(broadcast(model.totals))
      .select(col(idCol),
        coalesce(col("log_ratio"), model.oovLogRatio).as("__lr"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__lr")).as("log_weight"),
        avg(col("__lr")).as("mean_log_ratio"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
  }

  /** One-call convenience: fit explicit-unigram ratios on (target, raw) and
    * score `docs`. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, raw: DataFrame): DataFrame =
    score(docs, idCol, textCol, unigramLogRatios(target, raw, textCol))

  /** Gumbel-top-k resampling over importance log-weights: key each row by
    * `weight + Gumbel(0,1)` and take the k largest — a without-replacement
    * sample whose inclusion probabilities follow softmax(weight), the DSIR
    * selection rule (Vieira 2014's Gumbel-max trick, top-k form). The noise
    * is DETERMINISTIC — `g = −ln(−ln(u))` with `u` the content-keyed
    * [[Sampling.hashUnit]] uniform — so reruns and audits reproduce the
    * exact sample (the same contract as every sampler in [[Sampling]]).
    *
    * The selection key is rounded to 4 decimals BEFORE ranking (id breaks
    * ties) so the kept set is stable across engines computing `ln` at ulp
    * differences. `orderBy().limit(k)` plans as TakeOrdered — per-partition
    * top-k then a k-sized driver merge, no global sort at 100 TB. */
  def gumbelTopK(scored: DataFrame, idCol: String, weightCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = greatest(Sampling.hashUnit(col(idCol)), lit(1e-12))
    val key = col(weightCol) - log(-log(u))
    scored
      .where(col(weightCol).isNotNull)
      .withColumn("gumbel_key", floor(key * 10000 + 0.5) / 10000)
      .orderBy(desc("gumbel_key"), col(idCol))
      .limit(k)
  }
}
