package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Byte-pair-encoding tokenizer [Sennrich et al., ACL 2016] — real subword
  * token counts for budgeting/packing instead of the regex proxy
  * ([[TextAnalysis.bpeishTokenCount]]).
  *
  * Scale split, the textbook one: the corpus-sized work — word-frequency
  * counting — is ONE distributed word-count (partial-aggregated shuffle on
  * word strings); merge LEARNING then runs on the resulting word-TYPE
  * histogram, which is vocabulary-sized (≤ `maxWordTypes` rows) and lives on
  * the driver like every other model artifact here (IVF centroids, PQ
  * codebooks, PCA components). Applying the learned merges corpus-wide is a
  * map-only native expression (`graft_bpe_tokens`) with the merge table as a
  * foldable literal — zero UDFs, fuses with the scan.
  *
  * Both training and application fold case with `lower` (locale-independent
  * Spark semantics on both paths) and pre-tokenize on whitespace with a
  * word-end marker `</w>`, the original BPE formulation. */
object Bpe {

  /** Ordered merge list — rank = position. The whole model artifact. */
  final case class BpeModel(merges: Seq[(String, String)])

  /** One distributed word-count + the classic driver-side merge loop over
    * word types. `numMerges` bounds the learned vocabulary; `maxWordTypes`
    * caps the histogram the driver sees (highest-frequency types first —
    * rare tail types barely influence merges). Ties in pair frequency break
    * lexicographically, so the model is deterministic across partitionings
    * (pinned in BpeSpec). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWordTypes: Int = 50000): BpeModel = {
    require(numMerges > 0 && maxWordTypes > 0, "numMerges and maxWordTypes must be positive")
    val wordFreqs: Array[(String, Long)] = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWordTypes)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // word types as symbol sequences: chars, last one carrying the </w> marker
    var types: Array[(Array[String], Long)] = wordFreqs.map { case (w, c) =>
      val chars = w.map(_.toString).toArray
      if (chars.nonEmpty) chars(chars.length - 1) += "</w>"
      (chars, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairFreq = scala.collection.mutable.HashMap.empty[(String, String), Long]
      types.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val k = (syms(j), syms(j + 1))
          pairFreq.update(k, pairFreq.getOrElse(k, 0L) + c)
          j += 1
        }
      }
      if (pairFreq.isEmpty) exhausted = true
      else {
        val best = pairFreq.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val mergedSym = best._1 + best._2
        types = types.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += mergedSym; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, c)
          }
        }
        i += 1
      }
    }
    BpeModel(merges.toSeq)
  }

  /** Foldable merge-table literal: ARRAY<ARRAY<STRING>> of [a, b] pairs in
    * rank order. */
  def mergesLit(model: BpeModel): Column =
    array(model.merges.map { case (a, b) => array(lit(a), lit(b)) }: _*)

  /** Subword tokens per row (native `graft_bpe_tokens`): whitespace
    * pre-tokenize + lowercase, then greedy lowest-rank-first merging per
    * word — the standard BPE apply. Map-only. */
  def tokens(df: DataFrame, textCol: String, model: BpeModel,
             outCol: String = "bpe_tokens"): DataFrame = {
    graft.plans.HashExpressions.register(df.sparkSession)
    df.withColumn(outCol,
      call_function("graft_bpe_tokens", col(textCol), mergesLit(model)))
  }

  /** Real-model token count — the budgeting input for [[Packing]]. */
  def tokenCount(df: DataFrame, textCol: String, model: BpeModel,
                 outCol: String = "n_bpe_tokens"): DataFrame = {
    graft.plans.HashExpressions.register(df.sparkSession)
    df.withColumn(outCol,
      size(call_function("graft_bpe_tokens", col(textCol), mergesLit(model))))
  }

  /** Persist / load the merge list (rank-ordered) — the tokenizer artifact. */
  def save(spark: org.apache.spark.sql.SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b").coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
}
