package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relevance

class RelevanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val corpus = docs(
    (1L, "spark shuffles data across the cluster"),      // 6 tokens
    (2L, "data data everywhere and not a byte to train"),// 9 tokens, tf(data)=2
    (3L, "broadcast the small side"),                    // 4 tokens, no hits
    (4L, "Data quality beats data quantity"))            // 5 tokens, tf(data)=2 (case-folded)

  test("termFrequencies: case-folded exact counts; no-hit docs absent") {
    val tf = Relevance.termFrequencies(corpus, "doc_id", "text", Seq("data"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(tf.toSeq == Seq((1L, 1L), (2L, 2L), (4L, 2L)))
  }

  test("tfidfPerTerm: tf·N/df exact") {
    val out = Relevance.tfidfPerTerm(corpus, "doc_id", "text", Seq("data", "train"))
      .orderBy("doc_id", "term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // N=4; df(data)=3, df(train)=1
    assert(out.toSeq == Seq(
      (1L, "data", 1L, 3L, 1.0 * 4 / 3),
      (2L, "data", 2L, 3L, 2.0 * 4 / 3),
      (2L, "train", 1L, 1L, 1.0 * 4 / 1),
      (4L, "data", 2L, 3L, 2.0 * 4 / 3)))
  }

  test("DataFrame term set is row-identical to the literal path (x13 terms)") {
    val real = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
    val terms = Seq("join", "vector", "scan", "data")
    val viaLit = Relevance.termFrequencies(real, "doc_id", "text", terms)
      .orderBy("doc_id", "term").collect().map(_.toString).toSeq
    val viaDf = Relevance.termFrequencies(real, "doc_id", "text",
        terms.toDF("term"), "term")
      .orderBy("doc_id", "term").collect().map(_.toString).toSeq
    assert(viaLit.nonEmpty && viaLit == viaDf)
  }

  test("vocabulary-scale term set: 5k-term join path completes and counts exactly") {
    val real = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
    // a REAL vocabulary: the corpus's own distinct folded tokens (≤5000) —
    // with full coverage, termFrequencies must equal the plain word count
    val vocab = real.select(explode(graft.functions.TextAnalysis
        .tokens(col("text"))).as("t"))
      .select(lower(col("t")).as("term")).distinct().limit(5000)
    val t0 = System.nanoTime()
    val viaJoin = Relevance.termFrequencies(real, "doc_id", "text", vocab, "term")
      .agg(sum("tf")).head().getLong(0)
    val elapsed = (System.nanoTime() - t0) / 1e9
    val totalTokens = real.select(sum(graft.functions.TextAnalysis
        .tokenCount(col("text")))).head().getLong(0)
    assert(viaJoin == totalTokens,
      "full-coverage vocabulary tf must sum to the corpus token count")
    assert(elapsed < 60.0, f"vocabulary join path took $elapsed%.1f s")
  }

  test("bm25 matches the hand-computed Okapi formula") {
    val k1 = 1.2; val b = 0.75
    val n = 4.0; val avgdl = (6 + 9 + 4 + 5) / 4.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def ts(tf: Double, dl: Double) =
      tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    val expected = Map(
      1L -> idf(3) * ts(1, 6),
      2L -> (idf(3) * ts(2, 9) + idf(1) * ts(1, 9)),
      4L -> idf(3) * ts(2, 5))
    val got = Relevance.bm25(corpus, "doc_id", "text", Seq("data", "train"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(math.abs(got(id) - e) < 1e-12, s"doc $id: ${got(id)} vs $e")
    }
    // ranking sanity: doc 2 (two terms, one rare) outranks the single-hit docs
    assert(got(2L) > got(1L) && got(2L) > got(4L))
  }

  test("tokenRarity: exact mean corpus frequency; empty docs omitted") {
    import spark.implicits._
    val d = Seq((1L, "a a b"), (2L, "b c"), (3L, "")).toDF("doc_id", "text")
    val got = Relevance.tokenRarity(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // counts: a=2, b=2, c=1 → doc1 mean (2+2+2)/3 = 2; doc2 (2+1)/2 = 1.5
    assert(got == Set((1L, 3L, 2.0), (2L, 2L, 1.5)))
  }

  test("bigramAssociation: exact hand-computed score; short/empty docs omitted") {
    import spark.implicits._
    val d = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"), (4L, "")).toDF("doc_id", "text")
    // bigram instances: doc1 (a,b)(b,a)(a,b), doc2 (a,b)(b,c)
    // C2: (a,b)=3, (b,a)=1, (b,c)=1; C1 prefixes: a=3, b=2
    // doc1: ΣC2 = 3+1+3 = 7, ΣC1 = 3+2+3 = 8 → 0.875
    // doc2: ΣC2 = 3+1 = 4,   ΣC1 = 3+2 = 5   → 0.8
    val got = Relevance.bigramAssociation(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 3L, 0.875), (2L, 2L, 0.8)),
      "1-token and empty docs have no bigrams and must be absent")
  }

  test("bigramAssociationAgainst: reference stats only; unseen prefixes -> NULL") {
    import spark.implicits._
    val ref = Seq((100L, "a b c")).toDF("rid", "text") // C2: (a,b)=1,(b,c)=1; C1: a=1,b=1
    val fresh = Seq(
      (1L, "a b x"),  // (a,b):1/1 + (b,x):0/1 → 1/2
      (2L, "a b c"),  // (1+1)/(1+1) = 1.0
      (3L, "z z"),    // prefixes unseen → denominator 0 → NULL
      (4L, "q"))      // no bigrams → absent
      .toDF("doc_id", "text")
    val got = Relevance.bigramAssociationAgainst(fresh, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> ((2L, 0.5)), 2L -> ((2L, 1.0)), 3L -> ((1L, null))))
    assert(!got.contains(4L), "bigram-less docs are absent")
  }

  test("bigramAssociation is partitioning-invariant") {
    import spark.implicits._
    val d = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "b a b a a")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Relevance.bigramAssociation(df, "doc_id", "text")
        .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run(d.repartition(5)) == run(d.coalesce(1)))
  }

  // ------------------------------------------------------ vocabJsDivergence

  test("vocabJsDivergence matches the naive union-vocab JSD on a hand fixture") {
    import spark.implicits._
    // A: "a a b" → p(a)=2/3, p(b)=1/3; B: "a c" → p(a)=1/2, p(c)=1/2
    val df = Seq((1L, "A", "a a b"), (2L, "B", "a c")).toDF("doc_id", "g", "text")
    val row = Relevance.vocabJsDivergence(df, "g", "text").collect().head
    val pA = Map("a" -> 2.0 / 3, "b" -> 1.0 / 3)
    val pB = Map("a" -> 0.5, "c" -> 0.5)
    val want = (pA.keySet ++ pB.keySet).toSeq.map { t =>
      val (p, q) = (pA.getOrElse(t, 0.0), pB.getOrElse(t, 0.0))
      val m = (p + q) / 2
      (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
        (if (q > 0) 0.5 * q * math.log(q / m) else 0.0)
    }.sum
    assert(row.getString(0) == "A" && row.getString(1) == "B")
    assert(row.getLong(2) == 1L, "only 'a' is shared")
    assert(math.abs(row.getDouble(5) - want) < 1e-12)
  }

  test("zipfFit recovers an exactly planted power law (slope −1, r² 1)") {
    import spark.implicits._
    // c_i = 840/i for ranks 1..8 — all integers, so ln(c) = ln(840) − ln(rank)
    // EXACTLY: OLS must return slope −1, intercept ln(840), r² 1
    val counts = (1 to 8).map(i => s"w$i" -> 840 / i)
    val text = counts.flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")
    val row = Relevance.zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .collect().head
    assert(row.getLong(0) == 8L)
    assert(math.abs(row.getDouble(1) - (-1.0)) < 1e-9, s"slope ${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - math.log(840.0)) < 1e-9)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-9)
  }

  test("zipfFit caps at topN with deterministic tie-breaks") {
    import spark.implicits._
    val df = Seq((1L, "a a a b b c c d e f g h")).toDF("doc_id", "text")
    val row = Relevance.zipfFit(df.repartition(3), "text", topN = 4).collect().head
    assert(row.getLong(0) == 4L, "rank list capped at topN")
    // ties (c,d share count 2; d..h share 1): the cut keeps (a,b,c,d) by
    // (count DESC, term ASC) — rerun on a different partitioning agrees
    val again = Relevance.zipfFit(df.coalesce(1), "text", topN = 4).collect().head
    assert(row.toString == again.toString)
  }

  test("vocabJsDivergence: identical groups → 0, disjoint groups → ln 2") {
    import spark.implicits._
    val df = Seq(
      (1L, "p", "the cat sat"), (2L, "q", "the cat sat"),
      (3L, "r", "completely different words")).toDF("doc_id", "g", "text")
    val got = Relevance.vocabJsDivergence(df, "g", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    assert(got.keySet == Set(("p", "q"), ("p", "r"), ("q", "r")),
      "full pair universe, including disjoint pairs")
    assert(math.abs(got(("p", "q"))._2) < 1e-12)
    assert(got(("p", "r"))._1 == 0L)
    assert(math.abs(got(("p", "r"))._2 - math.log(2.0)) < 1e-12)
  }

  test("ngramDiversity: hand-counted types and instances; short-doc edges") {
    import spark.implicits._
    val df = Seq(
      // group a: "the cat the cat" + "The dog" →
      //   unigrams: [the, cat, the, cat, the, dog] = 6 inst, 3 types
      //   bigrams: [the cat, cat the, the cat] + [the dog] = 4 inst, 3 types
      (1L, "a", "the cat the cat"), (2L, "a", "The dog"),
      // group b: a 1-token doc (zero bigrams) + an empty doc (nothing)
      (3L, "b", "solo"), (4L, "b", ""),
      // group c: NULL group — excluded entirely
      (5L, null.asInstanceOf[String], "ghost words")).toDF("doc_id", "g", "text")
    val got = Relevance.ngramDiversity(df, "g", "text")
      .orderBy("g").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a", "b"))
    val a = got(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4))
      == ((6L, 3L, 4L, 3L)))
    assert(a.getDouble(5) == 3.0 / 6.0 && a.getDouble(6) == 3.0 / 4.0)
    val b = got(1)
    assert((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))
      == ((1L, 1L, 0L, 0L)))
    assert(b.getDouble(5) == 1.0 && b.isNullAt(6),
      "zero bigrams must yield NULL distinct_2, not a division artifact")
  }

  test("vocabCoverage: hand-counted curve, K beyond vocab saturates at 1") {
    import spark.implicits._
    // counts: the=4, cat=3, dog=2, sat=1 → total 10
    val df = Seq((1L, "the cat the dog"), (2L, "The cat sat the dog cat"))
      .toDF("doc_id", "text")
    val got = Relevance.vocabCoverage(df, "text", Seq(1, 2, 99))
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1, 4L, 10L, 0.4), (2, 7L, 10L, 0.7), (99, 10L, 10L, 1.0)))
    intercept[IllegalArgumentException](
      Relevance.vocabCoverage(df, "text", Seq.empty))
    intercept[IllegalArgumentException](
      Relevance.vocabCoverage(df, "text", Seq(0)))
  }

  test("rankingMetrics: hand-computed P/R@k, MRR, DCG, NDCG") {
    import spark.implicits._
    // query 1: retrieved ranks 1..3 = docs 10(rel 2), 11(rel 0), 12(rel 1);
    //          one judged-relevant doc (13, rel 1) NOT retrieved
    // query 2: retrieved rank 1 = doc 20, nothing judged relevant
    // query 3: judged (doc 30, rel 2) but NOTHING retrieved — must appear
    //          with zero recall/RR (trec_eval universe = run ∪ qrels)
    val run = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L)).toDF("query_id", "corpus_id", "rank")
    val qrels = Seq((1L, 10L, 2L), (1L, 12L, 1L), (1L, 13L, 1L),
      (1L, 11L, 0L), (2L, 20L, 0L), (3L, 30L, 2L))
      .toDF("query_id", "corpus_id", "rel")
    val out = Relevance.rankingMetrics(run, qrels, k = 3)
      .orderBy("query_id").collect()
    assert(out.length == 3)
    val q1 = out(0)
    assert(q1.getLong(1) == 3 && q1.getLong(2) == 2)
    assert(math.abs(q1.getDouble(3) - 2.0 / 3) < 1e-12)       // P@3
    assert(math.abs(q1.getDouble(4) - 2.0 / 3) < 1e-12)       // R@3
    assert(q1.getDouble(5) == 1.0)                            // first rel at 1
    val ln2 = math.log(2.0)
    val dcg = 3.0 / (math.log(2.0) / ln2) + 1.0 / (math.log(4.0) / ln2)
    assert(math.abs(q1.getDouble(6) - dcg) < 1e-12)
    // ideal for q1 at k=3: rels 2,1,1 at positions 1,2,3
    val idcg = 3.0 / (math.log(2.0) / ln2) + 1.0 / (math.log(3.0) / ln2) +
      1.0 / (math.log(4.0) / ln2)
    assert(math.abs(q1.getDouble(7) - dcg / idcg) < 1e-12)
    val q2 = out(1)
    assert(q2.getLong(1) == 0 && q2.getDouble(3) == 0.0 &&
      q2.isNullAt(4) && q2.getDouble(5) == 0.0 &&
      q2.getDouble(6) == 0.0 && q2.isNullAt(7))
    val q3 = out(2)
    assert(q3.getLong(0) == 3L)
    assert(q3.getLong(1) == 1 && q3.getLong(2) == 0)   // n_rel=1, none found
    assert(q3.getDouble(3) == 0.0 && q3.getDouble(4) == 0.0) // P@3, R@3 = 0
    assert(q3.getDouble(5) == 0.0 && q3.getDouble(6) == 0.0) // RR, DCG = 0
    assert(q3.getDouble(7) == 0.0)                     // NDCG 0 (idcg > 0)
    intercept[IllegalArgumentException](
      Relevance.rankingMetrics(run, qrels, 0))
  }

  test("vocabRichness: hand-computed Chao1 / Good-Turing / Simpson") {
    // group g1 tokens: a a b c → V=3, N=4, F1=2 (b,c), F2=1 (a)
    // chao1 = 3 + 2·1/(2·2) = 3.5; GT = 2/4 = 0.5
    // simpson = Σ n(n−1) / (N(N−1)) = 2 / 12 = 1/6
    val df = Seq(("g1", "a a"), ("g1", "b c")).toDF("g", "text")
    val r = Relevance.vocabRichness(df, "g", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("f1") == 2L && r.getAs[Long]("f2") == 1L)
    assert(math.abs(r.getAs[Double]("chao1") - 3.5) < 1e-15)
    assert(math.abs(r.getAs[Double]("gt_unseen_mass") - 0.5) < 1e-15)
    assert(math.abs(r.getAs[Double]("simpson") - 1.0 / 6) < 1e-15)
  }

  test("vocabRichness: all-hapax vs single-type extremes") {
    val df = Seq(("hapax", "a b c"), ("mono", "z z z")).toDF("g", "text")
    val got = Relevance.vocabRichness(df, "g", "text").collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    // all hapax: chao1 = 3 + 3·2/2 = 6 (heavy unseen mass), simpson = 0
    val h = got("hapax")
    assert(math.abs(h.getAs[Double]("chao1") - 6.0) < 1e-15)
    assert(h.getAs[Double]("gt_unseen_mass") == 1.0)
    assert(h.getAs[Double]("simpson") == 0.0)
    // one repeated type: chao1 = V = 1 (F1 = 0), GT = 0, simpson = 1
    val m = got("mono")
    assert(m.getAs[Double]("chao1") == 1.0)
    assert(m.getAs[Double]("gt_unseen_mass") == 0.0)
    assert(m.getAs[Double]("simpson") == 1.0)
  }

  test("vocabRichness: single-token group has undefined (NULL) simpson") {
    val df = Seq(("g", "only")).toDF("g", "text")
    val r = Relevance.vocabRichness(df, "g", "text").collect().head
    assert(r.getAs[Long]("n_tokens") == 1L)
    assert(r.isNullAt(r.fieldIndex("simpson")))
    assert(math.abs(r.getAs[Double]("gt_unseen_mass") - 1.0) < 1e-15)
  }

  test("vocabRichness: chao1 never undershoots the observed vocabulary and is partitioning-invariant") {
    val rows = (1 to 300).map(i => ("g", s"t${i % 37} t${i % 11} filler"))
    val a = Relevance.vocabRichness(rows.toDF("g", "text"), "g", "text")
      .collect().head
    val b = Relevance.vocabRichness(
        rows.toDF("g", "text").repartition(13), "g", "text")
      .collect().head
    assert(a.getAs[Double]("chao1") >= a.getAs[Long]("vocab").toDouble)
    // exact equality: every statistic is integer-ratio, fold-order-free
    assert(a.getAs[Double]("chao1") == b.getAs[Double]("chao1"))
    assert(a.getAs[Double]("simpson") == b.getAs[Double]("simpson"))
    assert(a.getAs[Double]("gt_unseen_mass") == b.getAs[Double]("gt_unseen_mass"))
  }

  test("hillTailIndex recovers the exact closed form on a planted Pareto tail") {
    // v_i = i^(−1/α): the j-th largest is j^(−1/α), so
    // ĥ = (1/(αk))·Σ_{j≤k} ln((k+1)/j) exactly
    val alpha = 2.5; val n = 400; val k = 50
    val vals = (1 to n).map(i => (i.toLong, math.pow(i, -1.0 / alpha)))
    val r = Relevance.hillTailIndex(
        vals.toDF("id", "v").repartition(7), "v", k).collect().head
    val want = (1 to k).map(j => math.log((k + 1).toDouble / j)).sum /
      (alpha * k)
    assert(r.getAs[Int]("k") == k)
    assert(math.abs(r.getAs[Double]("hill") - want) < 1e-9)
    assert(math.abs(r.getAs[Double]("alpha") - 1.0 / want) < 1e-6)
    assert(math.abs(r.getAs[Double]("threshold")
      - math.pow(k + 1, -1.0 / alpha)) < 1e-12)
  }

  test("hillTailIndex: tied top reads NULL alpha; undersized tail fails loudly; " +
    "non-positive values excluded") {
    val tied = (1 to 20).map(i => (i.toLong, 7.0))
    val r = Relevance.hillTailIndex(tied.toDF("id", "v"), "v", 10)
      .collect().head
    assert(r.getAs[Double]("hill") == 0.0)
    assert(r.isNullAt(r.fieldIndex("alpha")))
    val e = intercept[Exception] {
      Relevance.hillTailIndex(
        (1 to 5).map(i => (i.toLong, i.toDouble)).toDF("id", "v"),
        "v", 10).collect()
    }
    assert(e.getMessage.contains("fewer than"))
    // zeros/negatives are not tail observations: with them filtered the
    // positive count is 5 < k+1, so the same loud guard must fire
    val e2 = intercept[Exception] {
      Relevance.hillTailIndex(
        ((1 to 5).map(i => (i.toLong, i.toDouble))
          ++ (6 to 12).map(i => (i.toLong, -1.0 * i)))
          .toDF("id", "v"), "v", 10).collect()
    }
    assert(e2.getMessage.contains("fewer than"))
  }
}
