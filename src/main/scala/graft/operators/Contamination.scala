package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *
  * The broadcast is GUARDED, not unconditional: a misuse-scale "benchmark"
  * (say another corpus) would blow past the driver/executor broadcast limit,
  * so by default the postings are counted (one action over the small side
  * only) and the plan degrades to a shuffle join when the estimate exceeds
  * `spark.sql.autoBroadcastJoinThreshold`. Both paths produce identical
  * results (pinned in ContaminationSpec).
  */
object Contamination {

  /** Estimated in-memory bytes per broadcast posting row: 8-byte hash +
    * doc id + row object overhead. Deliberately conservative (high). */
  private val BytesPerPosting = 32L

  private def postings(df: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    graft.plans.HashExpressions.register(df.sparkSession)
    df.select(col(idCol),
        explode(array_distinct(
          call_function("graft_shingle_hashes", col(textCol), lit(k))))
          .as("__h"))
  }

  /** Apply the broadcast guard to the benchmark postings. Returns the
    * (possibly hinted) frame plus a finalizer that releases the persisted
    * postings once the caller's (small) result is materialized.
    *
    * `force = Some(true)` always broadcasts (caller knows the eval set is
    * small — zero extra actions), `Some(false)` never does; `None` (default)
    * persists + counts the postings and broadcasts only under the session
    * threshold. */
  private def guardedPostings(b: DataFrame, force: Option[Boolean])
      : (DataFrame, DataFrame => DataFrame) = force match {
    case Some(true)  => (broadcast(b), identity)
    case Some(false) => (b, identity)
    case None =>
      val persisted = b.persist(StorageLevel.MEMORY_AND_DISK)
      val threshold =
        b.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      val fits = threshold > 0 && persisted.count() * BytesPerPosting <= threshold
      val hinted = if (fits) broadcast(persisted) else persisted
      (hinted, out => CacheOps.materializeAndRelease(out, persisted))
  }

  /** All (corpus doc, benchmark doc) pairs sharing at least `minShared`
    * distinct k-grams, with the shared count. */
  def overlapPairs(corpus: DataFrame, corpusId: String, corpusText: String,
                   bench: DataFrame, benchId: String, benchText: String,
                   k: Int = 8, minShared: Int = 1,
                   benchBroadcast: Option[Boolean] = None): DataFrame = {
    val c = postings(corpus, corpusId, corpusText, k)
      .select(col(corpusId).as("corpus_id"), col("__h"))
    val (b, release) = guardedPostings(
      postings(bench, benchId, benchText, k)
        .select(col(benchId).as("bench_id"), col("__h")),
      benchBroadcast)
    release(c.join(b, "__h")
      .groupBy("corpus_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared))
  }

  /** Corpus ids contaminated by ANY benchmark doc. For minShared=1 this is
    * a semi-join on the hash — with the (guarded) broadcast, the corpus
    * never shuffles. */
  def contaminatedIds(corpus: DataFrame, corpusId: String, corpusText: String,
                      bench: DataFrame, benchId: String, benchText: String,
                      k: Int = 8, minShared: Int = 1,
                      benchBroadcast: Option[Boolean] = None): DataFrame =
    if (minShared <= 1) {
      val (b, release) = guardedPostings(
        postings(bench, benchId, benchText, k).select("__h").distinct(),
        benchBroadcast)
      release(postings(corpus, corpusId, corpusText, k)
        .join(b, Seq("__h"), "left_semi")
        .select(col(corpusId)).distinct())
    } else
      overlapPairs(corpus, corpusId, corpusText, bench, benchId, benchText,
        k, minShared, benchBroadcast)
        .select(col("corpus_id").as(corpusId)).distinct()

  /** The corpus with contaminated documents removed (anti-join on id). The
    * contaminated-id set is bounded by the benchmark's reach, so ITS
    * broadcast is unconditional — the guard applies to the postings join
    * inside [[contaminatedIds]]. */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusText: String,
                    bench: DataFrame, benchId: String, benchText: String,
                    k: Int = 8, minShared: Int = 1,
                    benchBroadcast: Option[Boolean] = None): DataFrame =
    corpus.join(
      broadcast(contaminatedIds(corpus, corpusId, corpusText,
        bench, benchId, benchText, k, minShared, benchBroadcast)),
      Seq(corpusId), "left_anti")
}
