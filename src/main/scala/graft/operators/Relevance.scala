package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus-statistical relevance scoring (TF-IDF / BM25) for a fixed term
  * set — ranking a 100 TB corpus against query terms, or weighting docs for
  * mixture sampling.
  *
  * Scale shape: tokenize → filter to the (small, literal) term set → ONE
  * narrow shuffle on (doc, term) for tf; document frequencies are a
  * |terms|-row aggregate broadcast back; corpus-wide counts (N, avgdl) are a
  * one-row frame broadcast into the plan — no driver-side count actions, the
  * whole thing is one lazy plan. Nothing is ever quadratic.
  *
  * Determinism note: BM25's log-idf is libm-exact only within one engine, and
  * cross-TERM double summation is fold-order-dependent — so the DuckDB-oracled
  * gate entry uses [[tfidfPerTerm]] (log-free, per-term rows, no cross-term
  * sum) plus a fixed-order conditional-sum spelling, while [[bm25]] is pinned
  * by a JVM-side spec.
  */
object Relevance {

  /** Locale-independent driver-side fold for term literals: document tokens
    * are folded with Spark's locale-independent `lower()`, so the term side
    * must use Locale.ROOT — a Turkish default locale would fold "I" to "ı"
    * and silently match nothing. */
  private def foldTerm(t: String): String =
    t.toLowerCase(java.util.Locale.ROOT)

  /** Per-(doc, term) term frequencies for the query terms (lowercased
    * match). Docs with no term hits are absent. */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String,
                      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val termArr = array(terms.map(t => lit(foldTerm(t))): _*)
    df.select(col(idCol),
        explode(filter(transform(TextAnalysis.tokens(col(textCol)),
          t => lower(t)), t => array_contains(termArr, t))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Vocabulary-scale term frequencies: the term set arrives as a DataFrame
    * instead of a literal array. The literal-array form filters each row's
    * tokens with an interpreted `array_contains` HOF — O(tokens × |terms|)
    * per document, fine for a handful of query terms but an anti-pattern for
    * a vocabulary. This form explodes tokens once (map-only) and equi-joins
    * the (deduplicated, lowercased) term set — the join side broadcasts when
    * it fits `autoBroadcastJoinThreshold` and degrades to a shuffle hash join
    * beyond it, so term-set size never changes per-row cost. Row-identical
    * to the literal path (pinned in RelevanceSpec). */
  def termFrequencies(df: DataFrame, idCol: String, textCol: String,
                      terms: DataFrame, termCol: String): DataFrame = {
    val termSet = terms.select(lower(col(termCol)).as("term")).distinct()
    df.select(col(idCol),
        explode(transform(TextAnalysis.tokens(col(textCol)), t => lower(t)))
          .as("term"))
      .join(termSet, "term")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col(idCol), col("term"), col("tf"))
  }

  /** Per-(doc, term) linear TF-IDF: `tf × N / df` with N = corpus size and
    * df = docs containing the term. Log-free by design (integer counts and
    * one exact double division), so the value is bit-identical across
    * engines — the oracled spelling of corpus-statistical weighting. */
  def tfidfPerTerm(df: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String]): DataFrame = {
    val tf = termFrequencies(df, idCol, textCol, terms)
    val n = df.select(count(lit(1)).as("__n"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    tf.join(broadcast(docFreq), "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"), col("tf"), col("df_docs"),
        (col("tf") * col("__n") / col("df_docs")).as("tfidf"))
  }

  /** Per-(doc, term) Okapi BM25 contribution:
    * idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), with
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). (doc, term) pairs with no
    * hits are absent. The per-term frame is the DETERMINISTIC face of BM25:
    * each value is one fixed expression tree over exact integer counts and
    * one ln, so callers that need an oracle-able total (x66) add the terms
    * in declared order instead of [[bm25]]'s fold-order aggregate sum. */
  def bm25PerTerm(df: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], k1: Double = 1.2,
                  b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // tokenize the fat text column ONCE into a persisted NARROW frame
    // (id, doc length, query-term hits) — tf, doc lengths, and the corpus
    // stats all derive from it without re-scanning the text
    val termArr = array(terms.map(t => lit(foldTerm(t))): _*)
    val toks = TextAnalysis.tokens(col(textCol))
    val base = df.select(col(idCol),
        size(toks).cast("double").as("__dl"),
        filter(transform(toks, t => lower(t)),
          t => array_contains(termArr, t)).as("__hits"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = base.select(col(idCol), explode(col("__hits")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = base.agg(count(lit(1)).as("__n"), avg("__dl").as("__avgdl"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
    val termScore = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val out = tf.join(broadcast(docFreq), "term")
      .join(base.select(col(idCol), col("__dl")), idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), (idf * termScore).as("score"))
    CacheOps.materializeAndRelease(out, base)
  }

  /** Okapi BM25 score per document over the term set: Σ_t of
    * [[bm25PerTerm]]. Docs with no term hits are absent (score 0 by
    * convention). The cross-term sum is an aggregate (fold-order
    * double addition) — use [[bm25PerTerm]] + fixed-order addition when the
    * total must be bit-reproducible. */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25PerTerm(df, idCol, textCol, terms, k1, b)
      .groupBy(col(idCol)).agg(sum("score").as("score"))

  /** Corpus-statistical token rarity per document: the mean corpus frequency
    * of a document's tokens (token instances weighted, so a doc full of rare
    * tokens scores low, boilerplate scores high). A cheap language-model-free
    * proxy for "surprisal" used to stratify pretraining mixtures.
    *
    * Shape: explode tokens → corpus token counts (one narrow shuffle on the
    * token string) → join the exploded tokens back on token → one (doc)
    * aggregate. The final score is ONE division of two exact integer sums,
    * so it is bit-identical across engines (no logs, no FP accumulation).
    * At 100 TB both shuffles partial-aggregate map-side; the token-count
    * frame is Zipf-headed but the join key is the token itself, so AQE's
    * skew split applies. */
  def tokenRarity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val counts = toks.groupBy("token").agg(count(lit(1)).as("__tc"))
    toks.join(counts, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        (sum("__tc").cast("double") / count(lit(1)).cast("double"))
          .as("mean_token_freq"))
  }

  /** Corpus bigram-association score per document — a language-model-ish
    * fluency proxy without a trained LM: over the doc's adjacent token pairs
    * (w₁,w₂), score = Σ C(w₁,w₂) / Σ C(w₁→·), where C(w₁,w₂) is the corpus
    * count of that bigram and C(w₁→·) the corpus count of w₁ as a bigram
    * prefix. High = the doc's transitions are the corpus' common transitions;
    * low = unusual/garbled sequencing. Log-free on purpose: the score is ONE
    * division of two exact integer sums, so it is bit-identical cross-engine
    * (a mean-log-probability would drag libm `log` and fold order into the
    * result — same rationale as [[tfidfPerTerm]] and [[tokenRarity]]).
    *
    * Scale: word-count shape twice — bigram instances explode map-side
    * (`zip_with` over two slices, no quadratic step), corpus counts are two
    * partial-aggregated shuffles on narrow string keys, the join-back hits
    * only surviving bigram keys, and the final per-doc aggregate is one
    * shuffle on the id. Documents with < 2 tokens have no bigrams and are
    * absent from the output (same contract as [[tokenRarity]]). */
  def bigramAssociation(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val bi = df.select(col(idCol),
        explode(zip_with(
          // greatest(…, 0): slice throws on negative length for empty docs
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bi"))
      .select(col(idCol), col("__bi.w1").as("w1"), col("__bi.w2").as("w2"))
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("__c1"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        (sum("__c2").cast("double") / sum("__c1").cast("double"))
          .as("bigram_assoc"))
  }

  /** Score documents against a REFERENCE corpus' bigram statistics — the
    * persisted-LM filtering pattern (train transition counts on a trusted
    * corpus once, score every new crawl against them; cf. CCNet's LM
    * filter, log-free here for cross-engine exactness like
    * [[bigramAssociation]]). Bigrams absent from the reference contribute 0
    * to the numerator; prefixes absent contribute 0 to the denominator
    * (LEFT joins); a doc whose prefixes NEVER occur in the reference has
    * denominator 0 → NULL score (unknowable, deliberately not 0 — an
    * all-unseen doc and a low-fluency doc are different signals).
    *
    * Scale: reference counts are two word-count aggregates computed once
    * (persist the frames to reuse across crawls); scoring is the same
    * narrow join-back shape as [[bigramAssociation]]. */
  def bigramAssociationAgainst(df: DataFrame, idCol: String, textCol: String,
                               reference: DataFrame, refTextCol: String): DataFrame = {
    def instances(frame: DataFrame, id: Option[Column], text: String): DataFrame = {
      val toks = TextAnalysis.tokens(col(text))
      val cols = id.toSeq :+ explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bi")
      frame.select(cols: _*)
        .withColumn("w1", col("__bi.w1")).withColumn("w2", col("__bi.w2"))
        .drop("__bi")
    }
    val ref = instances(reference, None, refTextCol)
    val c2 = ref.groupBy("w1", "w2").agg(count(lit(1)).as("__c2"))
    val c1 = ref.groupBy("w1").agg(count(lit(1)).as("__c1"))
    instances(df, Some(col(idCol)), textCol)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        (sum(coalesce(col("__c2"), lit(0L))).cast("double") /
          nullif(sum(coalesce(col("__c1"), lit(0L))), lit(0)).cast("double"))
          .as("ref_assoc"))
  }

  /** Pairwise Jensen–Shannon divergence between the unigram vocabulary
    * distributions of each `groupCol` value — the mixture-design diagnostic
    * ("how lexically far apart are my sources/languages?"). Output one row
    * per unordered group pair (group_a < group_b): shared-term count, each
    * side's probability mass on the shared vocabulary, and the JSD in nats
    * (0 = identical distributions, ln 2 ≈ 0.693 = disjoint vocabularies).
    *
    * Decomposition that avoids materializing the union vocabulary per pair:
    * terms on only ONE side contribute `½·p·ln 2` each, which telescopes to
    * `½·ln2·(1 − shared mass)` per side — so the whole divergence is an
    * INNER join over shared terms plus a closed-form correction:
    * `JSD = Σ_shared [½p·ln(2p/(p+q)) + ½q·ln(2q/(p+q))]
    *        + ½ln2·((1−cov_a) + (1−cov_b))`.
    * Pairs sharing no terms at all still appear (via the tiny group-pair
    * universe) with jsd = ln 2 exactly.
    *
    * Scale: one token-count shuffle builds the (group, term, p) relation;
    * the self-join shuffles on `term` and emits ≤ |groups|² rows per term —
    * `groupCol` is a mixture axis (languages, sources: tens, not millions),
    * so the pair fan-out is a constant factor on the vocabulary scan. NULL
    * groups are excluded. */
  def vocabJsDivergence(df: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val counts = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        explode(transform(TextAnalysis.tokens(col(textCol)), t => lower(t)))
          .as("term"))
      .groupBy("g", "term").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("g").agg(sum("c").as("n"))
    val dist = counts.join(broadcast(totals), "g")
      .select(col("g"), col("term"), (col("c") / col("n")).as("p"))
    val a = dist.select(col("g").as("group_a"), col("term"), col("p").as("pa"))
    val b = dist.select(col("g").as("group_b"), col("term"), col("p").as("pb"))
    val m = col("pa") + col("pb")
    val shared = a.join(b, Seq("term"))
      .where(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(lit(0.5) * col("pa") * log(lit(2.0) * col("pa") / m)
          + lit(0.5) * col("pb") * log(lit(2.0) * col("pb") / m)).as("__inner"),
        sum("pa").as("cov_a"), sum("pb").as("cov_b"))
    val halfLn2 = lit(0.5 * math.log(2.0))
    val pairs = totals.select(col("g").as("group_a"))
      .crossJoin(totals.select(col("g").as("group_b")))
      .where(col("group_a") < col("group_b"))
    pairs.join(shared, Seq("group_a", "group_b"), "left")
      .select(col("group_a"), col("group_b"),
        coalesce(col("n_shared_terms"), lit(0L)).as("n_shared_terms"),
        coalesce(col("cov_a"), lit(0.0)).as("cov_a"),
        coalesce(col("cov_b"), lit(0.0)).as("cov_b"),
        (coalesce(col("__inner"), lit(0.0)) +
          halfLn2 * ((lit(1.0) - coalesce(col("cov_a"), lit(0.0)))
            + (lit(1.0) - coalesce(col("cov_b"), lit(0.0))))).as("jsd"))
  }

  /** Zipf-law fit over the top-`topN` corpus terms — the standard corpus
    * health check: natural language shows ln(freq) ≈ α·ln(rank) + c with
    * α ≈ −1; a much flatter slope flags template/boilerplate corpora, a
    * much steeper one flags collapsed vocabulary. Returns ONE row:
    * (n_terms, slope, intercept, r2) from an OLS fit of ln(freq) on
    * ln(rank) via the built-in regression aggregates.
    *
    * Scale shape: the term count is the usual word-count shuffle; the
    * top-N cut is `orderBy().limit()` = TakeOrdered (per-partition top-N,
    * N-row driver merge — no global sort), and the ranking window runs
    * over AT MOST `topN` rows, so its single-partition sort is
    * constant-bounded at any corpus size. Rank ties at the cut break
    * deterministically by term. */
  /** Corpus diversity via distinct-n-gram ratios — the distinct-1 /
    * distinct-2 metrics of Li et al. (NAACL 2016), the standard quick read
    * on repetitiveness and mode collapse per corpus slice: for each
    * `groupCol` value, the unigram and bigram TYPE counts over lowercased
    * whitespace tokens, divided by the corresponding instance counts.
    * A slice of boilerplate scores near 0; fully novel text scores near 1.
    *
    * Shape: one explode per n-gram order into a (group, gram) frame, each
    * aggregated with count + count_distinct (both partial-aggregate
    * map-side; the distinct shuffles on (group, gram) — vocabulary-keyed,
    * Zipf-headed, AQE-splittable), then a |groups|-row join. The ratios
    * are one exact-integer division each, so the doubles are bit-identical
    * across engines — fully oracle-able, no rounding needed. Documents
    * with < 2 tokens contribute zero bigrams (not a collapsed shingle —
    * this counts real bigrams, unlike the near-dup featurizer's
    * short-text fallback). NULL groups are excluded. */
  def ngramDiversity(df: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    val toks = transform(TextAnalysis.tokens(col(textCol)), t => lower(t))
    val base = df.where(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), toks.as("__t"))
    val uni = base.select(col("grp"), explode(col("__t")).as("g"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_tokens"), count_distinct(col("g")).as("n_types"))
    val bi = base.select(col("grp"),
        explode(when(size(col("__t")) < 2,
            array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("__t")) - 1),
            i => concat_ws(" ", element_at(col("__t"), i),
              element_at(col("__t"), i + 1))))).as("g"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_bigrams"),
        count_distinct(col("g")).as("n_bigram_types"))
    uni.join(bi, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n_tokens"), col("n_types"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_bigram_types"), lit(0L)).as("n_bigram_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_1"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(null))
          .otherwise(col("n_bigram_types").cast("double")
            / col("n_bigrams").cast("double")).as("distinct_2"))
  }

  /** Top-K vocabulary coverage curve — the tokenizer-design question "what
    * fraction of token INSTANCES does a K-entry vocabulary cover": for each
    * requested K, the instance count and fraction covered by the K most
    * frequent (lowercased) tokens, ties broken lexicographically so the
    * curve is deterministic.
    *
    * Shape: ONE vocabulary-keyed count shuffle (partial-agg map-side),
    * persisted for its two consumers (the total and the top); the top-maxK
    * extraction is a TakeOrdered (distributed heads, never a global sort),
    * and the rank/cumulative window runs over ≤ maxK rows — a
    * model-artifact-sized frame, the only single-partition step. K beyond
    * the vocabulary saturates at coverage 1. */
  def vocabCoverage(df: DataFrame, textCol: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0),
      s"ks must be positive and non-empty, got $ks")
    val spark = df.sparkSession
    import spark.implicits._
    val maxK = ks.max
    val counts = df
      .select(explode(transform(TextAnalysis.tokens(col(textCol)),
        t => lower(t))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coalesce: sum over an EMPTY counts frame is NULL — surface the
    // empty/all-null corpus as a clear error, not an NPE (and never
    // divide by a zero total below)
    val total = counts.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    if (total == 0L) {
      counts.unpersist(false)
      throw new IllegalArgumentException(
        s"vocabCoverage: corpus has no tokens (empty or all-null '$textCol')")
    }
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("c"), col("term"))
    val ranked = counts.orderBy(desc("c"), col("term")).limit(maxK)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum",
        sum("c").over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    val out = ks.distinct.sorted.toDF("k")
      .join(ranked.select(col("rank"), col("cum")), col("rank") <= col("k"))
      .groupBy("k")
      .agg(max("cum").as("covered_tokens"))
      .select(col("k"), col("covered_tokens"),
        lit(total).as("total_tokens"),
        (col("covered_tokens").cast("double") / lit(total).cast("double"))
          .as("coverage"))
    CacheOps.materializeAndRelease(out, counts)
  }

  /** Per-group vocabulary-richness estimators — the corpus-diversity read a
    * tokenizer or mixture designer takes before trusting "vocab size" from a
    * finite sample (Chao 1984; Good 1953; Simpson 1949):
    *
    *  - `chao1`  = V + F1·(F1−1) / (2·(F2+1)) — bias-corrected lower-bound
    *    estimate of the TRUE type count, from the observed vocabulary V and
    *    the hapax/dis-legomena counts F1/F2 (defined even when F2 = 0);
    *  - `gt_unseen_mass` = F1/N — the Good–Turing probability that the NEXT
    *    token is an unseen type (how under-sampled the group still is);
    *  - `simpson` = Σ n_w(n_w−1) / (N(N−1)) — the probability two randomly
    *    drawn tokens are the same type (repetition concentration; NULL for
    *    single-token groups where it is undefined).
    *
    * Shape: one (group, token) count shuffle with map-side partials, then
    * one group-keyed aggregate — nothing driver-side, nothing quadratic.
    * Tokens are whitespace-split non-empties (the x58 spelling), CASE-
    * SENSITIVE (types, not folded terms).
    *
    * Determinism: every statistic is a ratio of exact integer aggregates —
    * the pair sum Σ n_w(n_w−1) folds in decimal(38,0) (Spark) / HUGEINT
    * (DuckDB) so it is overflow-safe and fold-order-free; the final IEEE
    * divisions are spelled identically cross-engine, so no rounding pin is
    * needed. (Per-type products stay in 64-bit: a single type with more
    * than ~3·10⁹ occurrences in one group would overflow — shard or window
    * the corpus before that point.) */
  def vocabRichness(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("__g"),
      explode(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
        .as("__w"))
    toks.groupBy("__g", "__w").agg(count(lit(1)).as("__n_w"))
      .groupBy("__g")
      .agg(sum("__n_w").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__n_w") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__n_w") === 2, 1L).otherwise(0L)).as("f2"),
        sum((col("__n_w") * (col("__n_w") - 1)).cast("decimal(38,0)"))
          .as("__pairs"))
      .select(col("__g").as(groupCol), col("n_tokens"), col("vocab"),
        col("f1"), col("f2"),
        (col("vocab").cast("double")
          + col("f1").cast("double") * (col("f1") - 1).cast("double")
            / (lit(2.0) * (col("f2").cast("double") + 1.0))).as("chao1"),
        (col("f1").cast("double") / col("n_tokens")).as("gt_unseen_mass"),
        when(col("n_tokens") > 1, col("__pairs").cast("double")
          / (col("n_tokens").cast("double")
            * (col("n_tokens").cast("double") - 1.0))).as("simpson"))
  }

  /** Hill tail-index estimator (Hill 1975, Ann. Stat. 3) — the
    * heavy-tail read next to [[zipfFit]]: over the k largest POSITIVE
    * values, `ĥ = (1/k)·Σ ln(x_(i)/x_(k+1))` and the tail index
    * `α = 1/ĥ` — α ≲ 2 means infinite variance (a single giant document
    * dominates any mean-based budget/quota), α large means a thin,
    * bounded tail. One row: `(k, threshold, hill, alpha)` with
    * `threshold = x_(k+1)`. `alpha` NULL when ĥ = 0 (the whole top-k
    * tied — no tail information); fewer than k+1 positive values fail
    * loudly (an undersized tail sample silently reads as thin).
    *
    * Shape: the top-(k+1) order statistics via orderBy+limit — Spark
    * plans TakeOrderedAndProject (per-partition heaps + a k-row driver
    * merge; never a global sort) — then ONE aggregate over k+1 rows of
    * per-row `ln(x/x_(k+1))` terms (a threshold-tied row divides to
    * exactly 1.0 and contributes exactly 0 — so the all-tied face reads
    * hill = 0 precisely on both engines). Ties at the threshold are
    * value-ties, so which rows the limit picks cannot change the
    * estimate. The ln-sum is a (k+1)-term double fold — round6 in the
    * gate absorbs engine fold ulps. */
  def hillTailIndex(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val top = df.select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && col("__v") > 0.0)
      .orderBy(col("__v").desc).limit(k + 1)
    // ĥ as a sum of PER-ROW ln(x/threshold) terms rather than
    // Σln x − (k+1)·ln(threshold): a row tied with the threshold divides
    // to exactly 1.0 and contributes exactly 0, so an all-tied top reads
    // hill = 0 precisely (the rearranged form leaves a ±k·ulp residue
    // whose SIGN decides the alpha-NULL face — unacceptable)
    val thr = top.agg(min("__v").as("threshold"))
    top.crossJoin(broadcast(thr))
      .agg(count(lit(1)).as("__n"), first("threshold").as("threshold"),
        sum(log(col("__v") / col("threshold"))).as("__slr"))
      .select(
        when(col("__n") < k + 1, raise_error(lit(
          s"hillTailIndex: fewer than ${k + 1} positive values — an " +
            "undersized tail sample would silently read as thin")))
          .otherwise(lit(k)).as("k"),
        col("threshold"),
        (col("__slr") / lit(k.toDouble)).as("hill"))
      .withColumn("alpha",
        when(col("hill") <= 0.0, lit(null).cast("double"))
          .otherwise(lit(1.0) / col("hill")))
  }

  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 2, s"need at least 2 ranks to fit, got $topN")
    val top = df
      .select(explode(transform(TextAnalysis.tokens(col(textCol)),
        t => lower(t))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("term"))
      .limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("c"), col("term"))
    top
      .withColumn("rank", row_number().over(w))
      .select(log(col("rank").cast("double")).as("lr"),
        log(col("c").cast("double")).as("lf"))
      .agg(count(lit(1)).as("n_terms"),
        regr_slope(col("lf"), col("lr")).as("slope"),
        regr_intercept(col("lf"), col("lr")).as("intercept"),
        (regr_r2(col("lf"), col("lr"))).as("r2"))
  }

  /** Graded ranking-quality metrics for a retrieval run — the evaluation
    * the RAG/retrieval side of a pipeline owes its users, next to
    * [[SimilaritySearch.recallAtK]]'s set-overlap recall [Järvelin &
    * Kekäläinen, TOIS 2002 (NDCG); the TREC MRR/P@k/R@k conventions]:
    * per query — `n_rel` (graded-relevant docs judged), `n_rel_ret`
    * (of them, retrieved in the top k), `precision_at_k` (denominator k —
    * the TREC convention, shallow result lists are penalized),
    * `recall_at_k`, `rr` (1/rank of the first relevant; 0 when none —
    * the MRR convention), `dcg_at_k` with the exponential gain
    * (2^rel − 1)/log2(rank+1), `ndcg_at_k` = dcg / idcg over the ideal
    * (rel DESC, corpus_id) ordering, NULL when a query has no judged
    * relevant docs (not 0 — unjudged ≠ bad).
    *
    * `run` is this repo's shared kNN schema (query_id, corpus_id, rank);
    * `qrels` carries integer `rel` grades ≥ 0 (0 = judged irrelevant).
    * Unjudged retrieved docs gain 0 — the standard honest treatment. The
    * query universe is run ∪ qrels: judged queries with NO retrieved
    * results score recall/RR of 0 (the trec_eval treatment) instead of
    * silently dropping out of the averages.
    *
    * Shape: one (query, corpus)-keyed left join of the rank-filtered run
    * against the qrels + one query-keyed aggregation; the ideal ranking
    * is a window over the QRELS (bounded by judgments per query, never
    * corpus rows). DCG folds a SORTED ≤k-entry list (fixed fold order —
    * the x93 discipline), so results are run-deterministic; the log2 is
    * spelled ln(x)/ln(2) for cross-engine replay, with libm ulps absorbed
    * by the gate's round4. */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val ln2 = log(lit(2.0))
    def gain(rel: Column, pos: Column): Column =
      (pow(lit(2.0), rel.cast("double")) - 1.0) /
        (log(pos.cast("double") + 1.0) / ln2)
    def foldDcg(sorted: Column): Column =
      aggregate(sorted, lit(0.0), (acc, x) => acc + x.getField("g"))
    val rel = qrels.select(col("query_id"), col("corpus_id"),
        col("rel").cast("long").as("__rel"))
      .where(col("__rel") > 0L)
    val retrieved = run.where(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("rank"))
      .join(rel, Seq("query_id", "corpus_id"), "left")
      .withColumn("__g", coalesce(col("__rel"), lit(0L)))
    val perQuery = retrieved.groupBy("query_id").agg(
      sum(when(col("__g") > 0L, 1L).otherwise(0L)).as("n_rel_ret"),
      min(when(col("__g") > 0L, col("rank"))).as("__first"),
      foldDcg(sort_array(collect_list(struct(col("rank").as("r"),
        gain(col("__g"), col("rank")).as("g"))))).as("dcg_at_k"))
    val wIdeal = Window.partitionBy("query_id")
      .orderBy(col("__rel").desc, col("corpus_id"))
    val ideal = rel.withColumn("__i", row_number().over(wIdeal))
      .where(col("__i") <= k)
      .groupBy("query_id").agg(
        foldDcg(sort_array(collect_list(struct(col("__i").as("r"),
          gain(col("__rel"), col("__i")).as("g"))))).as("__idcg"))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    // query universe = run ∪ qrels (the trec_eval convention): a judged
    // query the system retrieved NOTHING for must appear with zero
    // recall/RR, not vanish — run-side-only enumeration would overstate
    // averaged metrics exactly where the system fails hardest
    run.select("query_id").union(qrels.select("query_id")).distinct()
      .join(perQuery, Seq("query_id"), "left")
      .join(nRel, Seq("query_id"), "left")
      .join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_rel_ret"), lit(0L)).as("n_rel_ret"),
        (coalesce(col("n_rel_ret"), lit(0L)).cast("double") / k.toDouble)
          .as("precision_at_k"),
        when(col("n_rel") > 0L,
          coalesce(col("n_rel_ret"), lit(0L)).cast("double") /
            col("n_rel").cast("double")).as("recall_at_k"),
        when(col("__first").isNotNull,
          lit(1.0) / col("__first").cast("double")).otherwise(0.0).as("rr"),
        coalesce(col("dcg_at_k"), lit(0.0)).as("dcg_at_k"),
        when(col("__idcg") > 0.0, coalesce(col("dcg_at_k"), lit(0.0)) /
          col("__idcg")).as("ndcg_at_k"))
  }
}
