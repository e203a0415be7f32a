package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary comparison between two corpus sides — which words
  * distinguish source A from source B, beyond what raw frequency ratios
  * can say (they explode on rare words and ignore sample size).
  *
  * [[fightinWords]] is Monroe, Colaresi & Quinn 2008 ("Fightin' Words:
  * Lexical Feature Selection and Evaluation for Identifying the Content
  * of Political Conflict"), the standard method: the log-odds-ratio of
  * each term between the sides, shrunk by an informative Dirichlet prior
  * proportional to the POOLED term frequency, and z-scored by its
  * estimated variance — so rare terms need more evidence to rank, and
  * every term gets a comparable significance score. The pipeline use is
  * mixture debugging: what actually differs between two sources/drops
  * before and after a filter, stated as ranked vocabulary.
  *
  * With pooled count y = y_a + y_b, totals n_a/n_b (N = n_a + n_b),
  * prior α_w = priorScale·y/N (so Σα_w = priorScale = α₀):
  *   δ_w = ln((y_aw+α_w)/(n_a+α₀−y_aw−α_w)) − ln((y_bw+α_w)/(n_b+α₀−y_bw−α_w))
  *   σ²_w ≈ 1/(y_aw+α_w) + 1/(y_bw+α_w),   z_w = δ_w/σ_w
  *
  * Scale: ONE token-explode aggregation keyed by term (conditional sums
  * partial-aggregate map-side), a 1-row totals artifact broadcast back,
  * then map-only arithmetic — nothing beyond the token scan and the
  * term-keyed shuffle. Determinism: counts are exact integers; δ and z
  * are fixed IEEE expressions of them (ln/sqrt libm ulps absorbed by the
  * gate's round4). Rows with a NULL side are dropped (no side, no vote). */
object VocabComparison {

  /** One row per term with pooled count ≥ `minCount`: `term`, `n_a`,
    * `n_b`, `delta` (prior-shrunk log-odds, positive = A-leaning), `z`.
    * `sideA` must be a boolean column (true = side A). Tokens are the
    * whitespace tokenization (the corpus-stats convention shared with
    * [[Relevance.tokenRarity]]). */
  def fightinWords(df: DataFrame, sideA: Column, textCol: String,
                   priorScale: Double = 1.0, minCount: Long = 1L): DataFrame = {
    require(priorScale > 0.0, s"priorScale must be > 0, got $priorScale")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val toks = df.where(sideA.isNotNull)
      .select(sideA.as("__a"),
        explode(filter(split(col(textCol), "\\s+"),
          t => length(t) > 0)).as("term"))
    val counts = toks.groupBy("term").agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("__ya"),
      sum(when(col("__a"), 0L).otherwise(1L)).as("__yb"))
    val totals = counts.agg(sum("__ya").as("__na"), sum("__yb").as("__nb"))
    val ya = col("__ya").cast("double")
    val yb = col("__yb").cast("double")
    val a0 = lit(priorScale)
    val alpha = lit(priorScale) * (col("__ya") + col("__yb")).cast("double") /
      (col("__na") + col("__nb")).cast("double")
    val da = col("__na").cast("double") + a0 - ya - alpha
    val db = col("__nb").cast("double") + a0 - yb - alpha
    // Monroe's denominators (n_i + α₀ − y_iw − α_w) are positive except in
    // the degenerate case of a side whose whole token mass is one term and
    // a prior that exhausts it — report NULL there (no log-odds is
    // defined), never a divide-by-zero
    val deltaRaw = log((ya + alpha) / da) - log((yb + alpha) / db)
    val delta = when(da > 0.0 && db > 0.0, deltaRaw)
    val z = delta /
      sqrt(lit(1.0) / (ya + alpha) + lit(1.0) / (yb + alpha))
    counts.where(col("__ya") + col("__yb") >= minCount)
      .crossJoin(broadcast(totals))
      .select(col("term"), col("__ya").as("n_a"), col("__yb").as("n_b"),
        delta.as("delta"), z.as("z"))
  }
}
