package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-trained n-gram language-model scoring — the CCNet/KenLM-style
  * quality signal: docs whose token transitions are improbable under a
  * reference corpus score low, fluent prose scores high. Used to rank or
  * gate pretraining data by "perplexity against a trusted corpus".
  *
  * Spark-first shape: the MODEL IS A PAIR OF DATAFRAMES (unigram and bigram
  * count tables) — at 100 TB the bigram table is itself billions of rows, so
  * it must live as a distributed relation, not a driver artifact. Training
  * is two `groupBy().count()` aggregations (map-side partial combine, one
  * shuffle each); scoring explodes each document's adjacent token pairs and
  * equi-joins the count tables (AQE broadcasts them when they fit, degrades
  * to shuffle joins beyond — no collect anywhere). Everything stays inside
  * whole-stage codegen except the joins themselves.
  *
  * Smoothing is stupid backoff (Brants et al., EMNLP'07 — the scheme built
  * FOR web-scale counts): S(w2|w1) = c(w1 w2)/c(w1) when the bigram was
  * seen, else α·c(w2)/N, else α/N for out-of-vocabulary w2 (the 1/N floor
  * keeps log-scores finite). Scores are per-token mean log10 S — a
  * length-normalized negative "perplexity proxy"; HIGHER is more fluent.
  */
object LanguageModel {

  /** Bigram model: `unigrams` = (term, c1), `bigrams` = (w1, w2, c2),
    * `nTokens` = single row (n_tokens) — kept as lazy frames so scoring
    * composes into one plan. Persist the two tables for reuse across many
    * scoring runs (they are plain DataFrames — parquet round-trips). */
  final case class BigramLm(unigrams: DataFrame, bigrams: DataFrame,
                            nTokens: DataFrame)

  /** Lowercased whitespace tokens — the shared corpus tokenization. */
  private def toks(textCol: String): Column =
    transform(TextAnalysis.tokens(col(textCol)), t => lower(t))

  /** Adjacent-pair array `[(w1, w2), ...]` — empty below two tokens. */
  private def pairs(ts: Column): Column =
    when(size(ts) >= 2,
      zip_with(slice(ts, lit(1), size(ts) - 1), slice(ts, lit(2), size(ts) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Train the bigram model: two count aggregations over one tokenization.
    * N is derived from the unigram table (sum of counts), so the three
    * frames are consistent by construction. */
  def trainBigram(df: DataFrame, textCol: String): BigramLm = {
    val ts = toks(textCol)
    val uni = df.select(explode(ts).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val big = df.select(explode(pairs(ts)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val n = uni.agg(coalesce(sum(col("c1")), lit(0L)).as("n_tokens"))
    BigramLm(uni, big, n)
  }

  /** Score `docs` against a trained model: per-doc bigram count and mean
    * log10 stupid-backoff score. Docs with fewer than two tokens keep a
    * NULL score and n_bigrams = 0 (nothing is silently dropped).
    *
    * The backoff chain is spelled as one CASE so each position costs at
    * most three hash-join probes (bigram, c(w1), c(w2)) and no branch is
    * engine-dependent: seen bigram → c2/c(w1); unseen with known w2 →
    * (α·c(w2))/N; OOV → α/N. */
  def scoreStupidBackoff(docs: DataFrame, idCol: String, textCol: String,
                         lm: BigramLm, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val pos = docs.select(col(idCol), explode(pairs(toks(textCol))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val scored = pos
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.unigrams.select(col("term").as("w1"), col("c1").as("c1w1")),
        Seq("w1"), "left")
      .join(lm.unigrams.select(col("term").as("w2"), col("c1").as("c1w2")),
        Seq("w2"), "left")
      .crossJoin(broadcast(lm.nTokens))
      .select(col(idCol), log10(
        when(col("c2").isNotNull, col("c2") * lit(1.0) / col("c1w1"))
          .when(col("c1w2").isNotNull, lit(alpha) * col("c1w2") / col("n_tokens"))
          .otherwise(lit(alpha) / col("n_tokens"))).as("logp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), avg(col("logp")).as("lm_score"))
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /** Self-scoring convenience: train on the corpus and score the corpus —
    * the usual "rank my own crawl by fluency" call. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String,
                alpha: Double = 0.4): DataFrame =
    scoreStupidBackoff(docs, idCol, textCol, trainBigram(docs, textCol), alpha)
}
