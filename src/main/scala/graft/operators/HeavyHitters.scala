package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextAnalysis

/** Heavy-hitter token statistics for corpus curation — "what are the top-k
  * tokens / domains / values in this 100 TB column" without shuffling the
  * full frequency table.
  *
  * The naive `groupBy(token).count().orderBy.limit(k)` is exact but its
  * shuffle carries the whole vocabulary; at web scale that vocabulary is
  * billions of keys, of which k survive. The two-pass recipe here bounds
  * the shuffle by the sketch capacity instead:
  *
  *   pass 1 — a Misra–Gries summary ([[graft.plans.MisraGriesAggregate]],
  *     one aggregate whose partial state is ≤ capacity counters; the
  *     shuffle is `partitions × capacity` rows, vocabulary-independent);
  *   pass 2 — EXACT recount of the ≤ capacity surviving candidates (the
  *     corpus-side filter drops every non-candidate token before the
  *     aggregate, so this shuffle is also capacity-bounded).
  *
  * The result is certified globally exact when the k-th recounted candidate
  * exceeds the sketch's miss bound n/(capacity+1) (no non-candidate can
  * beat it), or when sum(est) = n (nothing was ever discarded — the sketch
  * held the entire vocabulary). Uncertifiable parameterizations throw by
  * default rather than silently returning a plausible-but-unproven top-k.
  */
object HeavyHitters {

  /** One-pass Misra–Gries summary rows `(term, est, n_tokens)` — est is an
    * under-estimate within n/(capacity+1) of the true count (see the
    * aggregate's scaladoc for both guarantees). */
  def sketch(df: DataFrame, tokenCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    graft.plans.HashExpressions.register(df.sparkSession)
    df.agg(call_function("graft_mg_sketch", col(tokenCol), lit(capacity)).as("s"))
      .select(col("s.n").as("n_tokens"), explode(col("s.items")).as("it"))
      .select(col("it.term").as("term"), col("it.est").as("est"),
        col("n_tokens"))
  }

  /** Certified exact top-k over a string column. Returns `(term, cnt)` in
    * (cnt desc, term asc) order — a k-row frame. The two corpus scans are
    * the whole cost; every shuffle and the driver-side candidate artifact
    * are bounded by `capacity`, never by vocabulary size.
    *
    * Certification: with n total tokens, any token absent from the sketch
    * has true count ≤ floor(n/(capacity+1)); if the k-th candidate's EXACT
    * count beats that bound (or nothing was ever discarded), no absent
    * token can displace the returned k. Otherwise the top-k is not provable
    * at this capacity — `requireCertified = false` returns the best-effort
    * result anyway (still exact counts, possibly missing a tail term);
    * the default throws with the bound so callers raise `capacity`. */
  def topKExact(df: DataFrame, tokenCol: String, k: Int, capacity: Int,
                requireCertified: Boolean = true): DataFrame = {
    require(k >= 1 && capacity >= k,
      s"need capacity >= k >= 1, got k=$k capacity=$capacity")
    val spark = df.sparkSession
    // pass 1: candidate terms — a ≤ capacity model artifact, same class of
    // driver-bounded collect as an IVF centroid table
    val sk = sketch(df, tokenCol, capacity).collect()
    if (sk.isEmpty) return emptyResult(spark)
    val n = sk.head.getLong(2)
    val sumEst = sk.map(_.getLong(1)).sum
    val missBound = n / (capacity + 1L)
    val cands = sk.map(_.getString(0))
    // pass 2: exact recount restricted to the candidates (broadcast the
    // tiny candidate set into the scan filter), collected — ≤ capacity rows
    val exact = df
      .where(col(tokenCol).isInCollection(cands))
      .groupBy(col(tokenCol).as("term"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val top = exact.take(k)
    val certified = sumEst == n || (top.length == k && top.last._2 > missBound)
    if (!certified && requireCertified) throw new IllegalStateException(
      s"top-$k not certifiable at capacity=$capacity: k-th exact count " +
        s"${if (top.length == k) top.last._2 else "<absent>"} does not beat " +
        s"the sketch miss bound $missBound (n=$n tokens). Raise capacity " +
        "or pass requireCertified = false for a best-effort result.")
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.map { case (t, c) => Row(t, c) }.toSeq, 1),
      resultSchema)
  }

  /** [[topKExact]] over whitespace-tokenized, lowercased document text —
    * the "top-k corpus tokens" spelling used by the gate entry. */
  def topTokens(docs: DataFrame, textCol: String, k: Int, capacity: Int,
                requireCertified: Boolean = true): DataFrame =
    topKExact(
      docs.select(explode(transform(TextAnalysis.tokens(col(textCol)),
        t => lower(t))).as("token")),
      "token", k, capacity, requireCertified)

  private val resultSchema = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))

  private def emptyResult(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], resultSchema)
}
