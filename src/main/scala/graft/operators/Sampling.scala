package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data pipelines (SURVEY.md §2c X6):
  * stratified quotas and weighted Bernoulli — the primitives behind dataset
  * mixing ("N docs per language", "p% of source X").
  *
  * Spark's `df.sample()` is seed-deterministic only for a FIXED partitioning —
  * repartition the input and the sample changes. These operators key the
  * randomness on a ROW's own identity (sha256 of its key), so a sample is
  * reproducible across runs, partitionings, engines, and cluster sizes — the
  * property a 100 TB pipeline needs to make reruns and audits converge
  * (cf. content-keyed sampling in C4/Dolma-style corpus builds).
  */
object Sampling {

  /** Uniform [0,1) from a key: first 8 hex chars of sha256(key) / 2^32.
    * Portable: identical text spelling exists in DuckDB/Postgres/Trino. */
  def hashUnit(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 8), 16, 10)
      .cast("double") / 4294967296.0

  /** Keep each row independently with probability `fraction` — deterministic
    * Bernoulli by key hash. One map-only pass, no shuffle. */
  def bernoulliByKey(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(hashUnit(col(keyCol)) < fraction)

  /** Up to `quota` rows per stratum, chosen by stable pseudorandom order
    * (hash of the key breaks insertion-order bias; key itself breaks hash
    * ties). One window pass — shuffles on the stratum column only.
    *
    * Skew note: a hot stratum serializes into one task; for quotas ≪ stratum
    * size use [[stratifiedQuotaGuarded]], which pre-filters the sort input
    * with [[bernoulliByKey]] and returns the SAME rows. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
                      quota: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(sha2(col(keyCol).cast("string"), 256), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota)
      .drop("__rn")
  }

  /** [[stratifiedQuota]] with the hot-stratum guard: rank only a Bernoulli
    * pre-sample instead of sorting whole strata.
    *
    * Output-identical by construction: the window sorts on the full sha256
    * hex string, and [[hashUnit]] is the numeric value of its first 8 hex
    * chars — hex lexicographic order refines that numeric prefix order, so
    * `hashUnit(key) < f` keeps exactly a PREFIX of each stratum's sort
    * order. As long as at least `quota` rows survive per stratum, the top
    * `quota` are the same rows stratifiedQuota would pick. The per-stratum
    * fraction `(quota + 6√quota + 10) / |stratum|` puts the survivor count
    * ~6σ above the quota (Chernoff lower-tail < 1e-8 per stratum); strata
    * no bigger than that keep fraction 1 and skip the guard entirely.
    *
    * Cost: one extra count aggregate over (stratum) — a narrow map-side-
    * combined pass — buys a window sort over O(quota) rows per stratum
    * instead of O(|stratum|). At 100 TB with a billion-row hot stratum and
    * quota 10k, that is the difference between a working job and a task
    * that sorts one stratum forever. */
  def stratifiedQuotaGuarded(df: DataFrame, stratumCol: String, keyCol: String,
                             quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val margin = quota + 6.0 * math.sqrt(quota.toDouble) + 10.0
    val fracs = df.groupBy(stratumCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(stratumCol), least(lit(1.0), lit(margin) / col("__n")).as("__f"))
    // NULL keys hash to NULL and sort FIRST in the unguarded window (sha2 of
    // NULL is NULL, asc_nulls_first) — keep them through the pre-filter so
    // the guarded output stays row-identical. (With several NULL-key rows in
    // one stratum their mutual order is tie-broken by nothing in either
    // form — same caveat as stratifiedQuota itself.)
    // The join key is NULL-SAFE (<=>): stratifiedQuota treats NULL as its own
    // window partition, so a plain equi-join would silently drop NULL-stratum
    // rows here and break the "returns the SAME rows" contract.
    val pre = df.join(
        broadcast(fracs.select(col(stratumCol).as("__stratum"), col("__f"))),
        col(stratumCol) <=> col("__stratum"))
      .where(col(keyCol).isNull || hashUnit(col(keyCol)) < col("__f"))
      .drop("__stratum", "__f")
    stratifiedQuota(pre, stratumCol, keyCol, quota)
  }

  /** Per-stratum Bernoulli fractions — dataset-mixture weights ("keep 80% of
    * en, 5% of und"). Strata absent from `fractions` fall back to `default`. */
  def weightedByStratum(df: DataFrame, stratumCol: String, keyCol: String,
                        fractions: Map[String, Double],
                        default: Double = 0.0): DataFrame = {
    val frac = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(col(stratumCol) === s, lit(f)).otherwise(acc)
    }
    df.where(hashUnit(col(keyCol)) < frac)
  }

  /** Temperature-flattened mixture RATES — the multilingual-corpus recipe
    * (XLM/mBERT style): allocate a `targetFrac`·N total budget across groups
    * proportionally to n_g^α, so α=1 keeps natural proportions, α→0
    * approaches uniform-per-group, and the usual α∈[0.3, 0.7] boosts
    * low-resource groups without drowning high-resource ones. The per-row
    * Bernoulli rate for group g is
    * `min(1, targetFrac · N · (n_g^α / Σ_h n_h^α) / n_g)` — a rate above 1
    * caps (the group is smaller than its allocation; the shortfall is NOT
    * reallocated — re-run with a higher α or frac if the realized total
    * matters).
    *
    * The fit is one groupBy-count whose result is a ≤`maxGroups`-row driver
    * artifact (groups are languages/sources, not data); the fold order for
    * Σ n^α is groups ASC by name, so the double is reproducible across
    * runs. α=0.5 routes through `sqrt` — the one power IEEE guarantees
    * correctly rounded, hence the cross-engine-exact choice for oracles.
    * NULL-group rows are counted in no group (and [[temperatureMixture]]
    * drops them — rate 0). */
  def temperatureRates(df: DataFrame, groupCol: String, alpha: Double,
                       targetFrac: Double,
                       maxGroups: Int = 10000): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac must be in (0,1], got $targetFrac")
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    require(counts.size <= maxGroups,
      s"${counts.size} groups exceed maxGroups=$maxGroups — not a mixture axis")
    def pow(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val total = counts.map(_._2).sum
    val s = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + pow(n) }
    counts.map { case (g, n) =>
      g -> math.min(1.0, targetFrac * total * pow(n) / s / n)
    }.toMap
  }

  /** [[temperatureRates]] applied as the content-keyed Bernoulli mixture —
    * one fit job, then the same map-only filter as [[weightedByStratum]].
    * NULL-group rows are dropped (rate 0). */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         alpha: Double, targetFrac: Double,
                         maxGroups: Int = 10000): DataFrame =
    weightedByStratum(df, groupCol, keyCol,
      temperatureRates(df, groupCol, alpha, targetFrac, maxGroups),
      default = 0.0)

  /** Deterministic train/val/test split assignment: each row gets the first
    * label whose cumulative weight exceeds its [[hashUnit]] draw. Keyed on
    * row identity, so the split is stable across runs, partitionings, and
    * engines — a document never migrates between train and test when the
    * corpus is rebuilt (the leakage property that matters). Map-only; weights
    * must sum to 1 (the last label absorbs any floating remainder). */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val u = hashUnit(col(keyCol))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val label = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      when(u < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** LEAKAGE-SAFE train/val/test split: [[splitAssign]] keyed on the
    * near-duplicate CLUSTER instead of the document, so a document and its
    * near-duplicates always land in the SAME split — the standard eval sin
    * (train/test contamination through near-dups the row-level split can't
    * see) prevented structurally. `pairs` is any near-dup pair frame
    * ([[NearDup.nearDuplicates]], SimHash, embedding pairs, ...); ids must
    * be integral (the [[ConnectedComponents]] graph contract). Rows in no
    * pair are their own singleton cluster, and for them the assignment is
    * IDENTICAL to `splitAssign(df, idCol, splits)` — adding pair evidence
    * never reshuffles untouched documents (spec-pinned).
    *
    * Scale: the component fixed point is O(log²) rounds of narrow long
    * shuffles; the label is then one map-side hash of the cluster id —
    * same cost shape as the fuzzy dedup this composes with. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       pairCol1: String = "id_1",
                       pairCol2: String = "id_2"): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = df.select(col(idCol)).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"leakageSafeSplit id column '$idCol' must be integral " +
        s"(the ConnectedComponents graph contract), got ${idType.simpleString}")
    val comp = ConnectedComponents.components(pairs, pairCol1, pairCol2)
    val withCluster = df.join(comp,
        col(idCol).cast("long") === col("node"), "left")
      .withColumn("__cluster", coalesce(col("component"), col(idCol).cast("long")))
      .drop("node", "component")
    splitAssign(withCluster, "__cluster", splits).drop("__cluster")
  }

  /** Weighted sample WITHOUT replacement of EXACT size k — the missing
    * shape next to the Bernoulli samplers above (those draw a random-SIZE
    * sample): inclusion driven by per-row weight, result exactly k rows.
    * Mechanism is the Efraimidis–Spirakis exponential race (A-ES, IPL
    * 2006): rank ascending by `-ln(u) / w` with u the row's content-keyed
    * uniform draw — the k smallest keys are a weight-proportional sample
    * without replacement. u = (hash32 + 0.5) / 2^32 ∈ (0, 1) strictly, so
    * the log never sees 0; like every sampler here the draw is keyed on
    * row identity + salt, hence reproducible across runs, partitionings,
    * and engines (the DuckDB oracle recomputes the identical keys).
    *
    * Rows with NULL or non-positive weight are excluded (they'd win or
    * lose the race degenerately; a zero-weight row should simply never be
    * sampled). Output: the input columns plus `aes_key` (audit column —
    * re-sorting by it reproduces the selection order).
    *
    * Scale: map-only key computation + a global top-k, which plans as
    * TakeOrderedAndProject (per-partition heaps, k-row merge on the
    * driver) — no global sort, no shuffle of the corpus. Per-stratum form:
    * [[weightedSampleByStratum]]. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
                     k: Int, salt: String = "aes"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.where(weightCol.isNotNull && weightCol > 0)
      .withColumn("aes_key", aesKey(col(keyCol), weightCol, salt))
      .orderBy(col("aes_key"), col(keyCol))
      .limit(k)
  }

  /** [[weightedSample]] with an exact-k race PER STRATUM (k best keys in
    * each group — "200 weight-proportional docs per language"). One
    * grouped window; a hot stratum serializes its sort into one task, the
    * same caveat (and the same Bernoulli pre-filter remedy) as
    * [[stratifiedQuota]] vs [[stratifiedQuotaGuarded]]. */
  def weightedSampleByStratum(df: DataFrame, stratumCol: String,
                              keyCol: String, weightCol: Column, k: Int,
                              salt: String = "aes"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(stratumCol)
      .orderBy(col("aes_key"), col(keyCol))
    df.where(weightCol.isNotNull && weightCol > 0)
      .withColumn("aes_key", aesKey(col(keyCol), weightCol, salt))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** The A-ES race key: -ln((hash32 + 0.5)/2^32) / w, hash32 the first 8
    * hex chars of sha256(key:salt) — the numeric sibling of [[hashUnit]],
    * offset half a step so u is strictly inside (0, 1). */
  private[graft] def aesKey(key: Column, weight: Column, salt: String): Column = {
    val h = conv(substring(
      sha2(concat_ws(":", key.cast("string"), lit(salt)), 256), 1, 8), 16, 10)
      .cast("double")
    -log((h + 0.5) / 4294967296.0) / weight.cast("double")
  }

  /** Deterministic corpus shuffle — reproducible training order: a total
    * ORDER BY sha256(key:salt). Content-keyed like [[splitAssign]], so the
    * order is identical across runs, partitionings, and engines; changing
    * `salt` gives an independent permutation (new epoch order without
    * touching the data). The id tiebreak makes the order total even under a
    * (cryptographically impossible) hash collision — PROVIDED `keyCol` is
    * unique and non-null: rows sharing a key (or all-NULL keys, which
    * `concat_ws` folds to the bare salt) sort together with engine-dependent
    * relative order, so use a unique document id as the key.
    *
    * Scale: a global sort is ONE range-exchange (sample → range-partition →
    * local sort) — the standard reproducible-shuffle pass before writing
    * training shards; downstream sharding comes free from the sorted write's
    * file order. */
  def deterministicShuffle(df: DataFrame, keyCol: String, salt: String): DataFrame =
    df.orderBy(
      sha2(concat_ws(":", col(keyCol).cast("string"), lit(salt)), 256),
      col(keyCol))

  /** Materialize per-group epoch counts into a concrete repeated dataset —
    * the follow-through of [[MixtureOptimization.unimaxAllocation]] (or any
    * mixture recipe emitting fractional epochs): a group scheduled for
    * 1.55 epochs emits every row once, plus a second copy for a
    * deterministic 55% of rows — chosen by the row's own key hash
    * ([[hashUnit]] salted with `salt`), so the materialization is
    * reproducible, partitioning-invariant, and decorrelated from any
    * split/sample decision keyed on the same ids. Expected output rows per
    * group = n_g · epochs_g — the token budget the allocation promised.
    *
    * Output: the input rows with a `copy` column (1..n_copies); rows with
    * 0 copies (epochs 0, or NULL epochs — an unallocated group) are
    * absent. Negative epochs fail loudly, as does a DUPLICATE group row in
    * the epochs artifact — a non-unique group would fan out the join and
    * silently inflate the materialized dataset.
    *
    * Shape: one broadcast join against the |groups|-row epochs artifact +
    * a map-only explode — no shuffle. The fractional-part comparison uses
    * the same IEEE doubles on any engine (epochs arrives as exact-integer
    * divisions from the allocator), so a SQL replay is bit-identical. */
  def materializeEpochs(df: DataFrame, keyCol: String, groupCol: String,
                        epochs: DataFrame, epochsCol: String = "epochs",
                        salt: String = "epoch"): DataFrame = {
    // uniqueness guard runs on the K-row artifact itself (one tiny agg):
    // count per group, raise_error on any duplicate at execution time —
    // distributed fail-loud, no driver-side action
    val one = epochs.select(col(groupCol), col(epochsCol))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("__n"), first(col(epochsCol)).as("__eraw"))
    val e = when(col("__n") > 1,
        raise_error(lit("materializeEpochs: duplicate group rows in epochs")))
      .when(col("__eraw") < 0,
        raise_error(lit("materializeEpochs: negative epochs")))
      .otherwise(col("__eraw").cast("double"))
    val joined = df.join(
      broadcast(one.select(col(groupCol), e.as("__e"))),
      Seq(groupCol), "left")
    val base = floor(col("__e")).cast("long")
    val u = hashUnit(concat(col(keyCol).cast("string"), lit(":" + salt)))
    val copies = coalesce(
      base + when(u < col("__e") - floor(col("__e")), 1L).otherwise(0L),
      lit(0L))
    joined.withColumn("__c", copies)
      .withColumn("copy",
        explode(when(col("__c") >= 1L, sequence(lit(1L), col("__c")))
          .otherwise(array().cast("array<long>"))))
      .drop("__e", "__c")
  }
}
