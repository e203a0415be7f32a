package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus SELECTION — choosing WHICH cleaned documents a training run gets,
  * after dedup/filter decide which are usable. Two standard curation
  * policies:
  *
  *   - token-budget fill ([[selectByBudget]]): "the run affords B tokens;
  *     take the best-scored documents until the budget is spent" — the
  *     greedy knapsack every data-mixing recipe reduces to when documents
  *     are small relative to the budget;
  *   - quantile threshold ([[keepAboveQuantile]]): "keep the top (1−q)
  *     fraction by score" — a rank cut, so it composes with any score
  *     without per-dataset threshold tuning.
  *
  * Both are deterministic (score ties broken by id) and both avoid the
  * single-partition global window that a naive `SUM(...) OVER (ORDER BY …)`
  * spelling costs: the running total uses the distributed-scan recipe
  * (range partition → per-partition subtotals prefix-scanned on the driver →
  * partition-local cumulative window), and the rank cut fits its threshold
  * with [[Percentiles.exactGlobalValues]]'s range-sort. Driver-side state is
  * O(partitions) longs / O(1) doubles — model artifacts, not data.
  *
  * Reference scope note: the reference engine (operators.py:80) delegates
  * all transformation to Postgres and has no curation surface; this
  * extension is SURVEY.md §2c territory.
  */
object Selection {

  /** Greedy budget fill: rank rows by (`scoreCol` DESC, `idCol` ASC), keep
    * every row whose RUNNING token total (including itself) fits in
    * `budget`. Output: (idCol, n_tokens, cum_tokens) for kept rows —
    * `cum_tokens` is the running total in selection order, so the largest
    * kept `cum_tokens` is the realized budget spend.
    *
    * The "including itself" rule means one document mid-stream whose tokens
    * would overshoot is dropped while LATER, smaller documents still fit —
    * the fill keeps consuming down the ranking (standard greedy knapsack
    * behavior, and what the windowed-SQL spelling computes too).
    *
    * NULL handling: a NULL score sorts last (after every real score); NULL
    * token counts fill as zero — both keep the scan total-ordered and
    * NULL-free so offsets compose exactly ([[Packing.packSequences]]'s
    * argument).
    *
    * Scale: one range shuffle on (score, id) + a partition-local sort; the
    * driver sees `partitions` subtotal longs. No global single-partition
    * window at any corpus size. */
  def selectByBudget(df: DataFrame, idCol: String, scoreCol: Column,
                     nTokens: Column, budget: Long,
                     partitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // pinned frame: the subtotal pass and the rank pass must see the SAME
    // sampled range boundaries. Narrow rows: (id, score, count).
    val base = df.select(col(idCol), scoreCol.as("__s"),
        coalesce(nTokens.cast("long"), lit(0L)).as("n_tokens"))
      .repartitionByRange(p, col("__s").desc_nulls_last, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = base.groupBy("__pid").agg(sum("n_tokens").as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) =>
      acc + subtotals.getOrElse(i, 0L))
    val offsetOf = element_at(
      map(offsets.take(p).zipWithIndex
        .flatMap { case (o, i) => Seq(lit(i), lit(o)) }: _*),
      col("__pid"))
    val w = Window.partitionBy("__pid")
      .orderBy(col("__s").desc_nulls_last, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = base
      .withColumn("cum_tokens", offsetOf + sum("n_tokens").over(w))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col("n_tokens"), col("cum_tokens"))
    CacheOps.materializeAndRelease(out, base)
  }

  /** Rank cut: keep rows whose `scoreCol` is ≥ the exact q-quantile of the
    * score — "top (1−q) of the corpus by quality". The threshold is fitted
    * with [[Percentiles.exactGlobalValues]] (distributed range-sort,
    * `QUANTILE_CONT` interpolation semantics) and applied as a map-only
    * filter, so the pass is one narrow extra shuffle plus the scan it was
    * already doing. NULL scores never pass (SQL comparison semantics); an
    * all-NULL score column keeps nothing. */
  def keepAboveQuantile(df: DataFrame, scoreCol: String, q: Double): DataFrame = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    Percentiles.exactGlobalValues(df, scoreCol, Seq(q)).head match {
      case Some(threshold) => df.where(col(scoreCol).cast("double") >= threshold)
      case None => df.where(lit(false))
    }
  }
}
