package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based parallel-corpus (bitext) mining — the scoring rule of
  * Artetxe & Schwenk, "Margin-based Parallel Corpus Mining with Multilingual
  * Sentence Embeddings" (ACL 2019), the method behind CCMatrix/CCAligned-
  * scale parallel-data harvesting. Raw cosine retrieves HUBS — sentences
  * that sit close to everything in the embedding space — so global-threshold
  * cosine mining drowns in false pairs. The ratio margin normalizes each
  * candidate score by the mean of both endpoints' top-k neighborhoods:
  *
  *   margin(x, y) = cos(x, y) / (avgTopK(x)/2 + avgTopK(y)/2)
  *
  * so only pairs MUTUALLY much closer than their ambient neighborhoods
  * survive. A hub's dense neighborhood inflates its denominator and kills
  * its candidacies automatically.
  *
  * Engine-agnostic composition: both inputs are plain kNN frames in the
  * repo's shared (query_id, corpus_id, score, rank) schema —
  * [[SimilaritySearch.topKAll]] exact, [[SimilaritySearch.lshBucketedTopK]],
  * or the IVF index path all fit, so the 100 TB deployment swaps brute-force
  * for ANN without touching the scoring. Cost beyond the searches is
  * negligible: one k-row-per-id average per side (map-side partial), two
  * key joins, and a per-query top-1 window over ≤k candidate rows.
  */
object Bitext {

  /** Ratio margin for every candidate pair in `ab`.
    *
    * @param ab for each LEFT id, its top-k in the right corpus:
    *           (query_id, corpus_id, score, ...) — query_id is the left id
    * @param ba the REVERSE search: for each right id, its top-k in the left
    *           corpus. Only its per-query score averages are used; its
    *           candidate set need not mirror `ab`'s.
    * @return (a_id, b_id, score, margin) — one row per `ab` candidate whose
    *         b-side appears as a query in `ba` (an ANN `ba` that never
    *         queried some b yields no denominator for it; inner join keeps
    *         the contract honest rather than silently defaulting)
    */
  def marginScores(ab: DataFrame, ba: DataFrame): DataFrame = {
    // the ab frame feeds BOTH its own average and the candidate list — pin
    // it so an expensive upstream search (a cross-join exact kNN) never
    // executes twice (the repo's double-consumer rule); k·|ids| rows
    val abP = ab.localCheckpoint(true)
    val avgA = topKAvg(abP, "a_id", "__avg_a")
    val avgB = topKAvg(ba, "b_id", "__avg_b")
    abP.select(col("query_id").as("a_id"), col("corpus_id").as("b_id"),
        col("score"))
      .join(avgA, "a_id")
      .join(avgB, "b_id")
      .withColumn("margin",
        col("score") / ((col("__avg_a") + col("__avg_b")) / 2.0))
      .select("a_id", "b_id", "score", "margin")
  }

  /** Per-query mean of the top-k scores via a FIXED-ORDER fold — Spark's
    * `avg` sums partial states in arrival order, so a k-term double sum
    * would drift by ulps across runs/partitionings; folding the sorted
    * (rank, corpus_id, score) list left-to-right makes the denominator
    * deterministic (the repo's fixed-fold-order rule). */
  private def topKAvg(knn: DataFrame, outId: String,
                      outAvg: String): DataFrame =
    knn.groupBy(col("query_id").as(outId))
      .agg(sort_array(collect_list(struct(col("rank"), col("corpus_id"),
        col("score")))).as("__s"))
      .select(col(outId),
        (aggregate(col("__s"), lit(0.0), (a, t) => a + t("score"))
          / size(col("__s"))).as(outAvg))

  /** Forward mining: each left id's single best-margin partner, with an
    * `accepted` flag at `minMargin` (the pair survives into the mined
    * corpus) rather than a filter — emitting every left id keeps the output
    * cardinality fixed and auditable (the rejected tail is the quality
    * signal a threshold sweep reads). Ties broken by b_id ascending, so the
    * pick is deterministic through equal margins. */
  def minePairs(ab: DataFrame, ba: DataFrame,
                minMargin: Double): DataFrame = {
    val w = Window.partitionBy("a_id")
      .orderBy(col("margin").desc, col("b_id"))
    marginScores(ab, ba)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("a_id"), col("b_id"), col("score"), col("margin"),
        (col("margin") >= minMargin).as("accepted"))
  }
}
