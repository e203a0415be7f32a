package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find (and remove) training documents that
  * share k-token n-grams with an evaluation/benchmark set — the standard
  * leakage control run before pretraining.
  *
  * Scale shape: the benchmark side is SMALL by nature (eval sets are
  * thousands of docs, the corpus is billions), so its distinct shingle-hash
  * postings BROADCAST; the corpus side streams through one map-only
  * shingle pass and a broadcast hash join — no corpus shuffle at all for
  * the contaminated-id set. Shared n-grams are counted on 8-byte xxhash64
  * shingle hashes (injective in practice at corpus scale; identical counts
  * to string shingles — same argument as the x02d inverted index).
  */
object Contamination {

  private def postings(df: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    graft.plans.HashExpressions.register(df.sparkSession)
    df.select(col(idCol),
        explode(array_distinct(
          call_function("graft_shingle_hashes", col(textCol), lit(k))))
          .as("__h"))
  }

  /** All (corpus doc, benchmark doc) pairs sharing at least `minShared`
    * distinct k-grams, with the shared count. */
  def overlapPairs(corpus: DataFrame, corpusId: String, corpusText: String,
                   bench: DataFrame, benchId: String, benchText: String,
                   k: Int = 8, minShared: Int = 1): DataFrame = {
    val c = postings(corpus, corpusId, corpusText, k)
      .select(col(corpusId).as("corpus_id"), col("__h"))
    val b = postings(bench, benchId, benchText, k)
      .select(col(benchId).as("bench_id"), col("__h"))
    c.join(broadcast(b), "__h")
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Corpus ids contaminated by ANY benchmark doc. For minShared=1 this is
    * a broadcast semi-join on the hash — the corpus never shuffles. */
  def contaminatedIds(corpus: DataFrame, corpusId: String, corpusText: String,
                      bench: DataFrame, benchId: String, benchText: String,
                      k: Int = 8, minShared: Int = 1): DataFrame =
    if (minShared <= 1) {
      val b = postings(bench, benchId, benchText, k).select("__h").distinct()
      postings(corpus, corpusId, corpusText, k)
        .join(broadcast(b), Seq("__h"), "left_semi")
        .select(col(corpusId)).distinct()
    } else
      overlapPairs(corpus, corpusId, corpusText, bench, benchId, benchText,
        k, minShared)
        .select(col("corpus_id").as(corpusId)).distinct()

  /** The corpus with contaminated documents removed (anti-join on id). */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
                    bench: DataFrame, benchId: String, benchText: String,
                    k: Int = 8, minShared: Int = 1): DataFrame =
    corpus.join(
      broadcast(contaminatedIds(corpus, corpusId, corpusText,
        bench, benchId, benchText, k, minShared)),
      Seq(corpusId), "left_anti")
}
