package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.syntax._

/** The fluent facade is pure sugar: every verb must be ROW-IDENTICAL to the
  * operator call it delegates to, and verbs must chain. */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("facade verbs are row-identical to their operator calls") {
    assert(rows(docs.graft.dedupeExact(Seq("text"), "doc_id")) ==
      rows(graft.operators.Dedup.exactKeepFirst(docs, Seq("text"), "doc_id")))
    val seen = docs.where(col("doc_id") < 250)
    val fresh = docs.where(col("doc_id") >= 250)
    assert(rows(fresh.graft.dedupeAgainst(seen, _("text"))) ==
      rows(graft.operators.Dedup.dedupeAgainst(fresh, seen, _("text"))))
    assert(rows(docs.graft.epochShuffle("doc_id", "e1").select("doc_id")) ==
      rows(graft.operators.Sampling.deterministicShuffle(docs, "doc_id", "e1")
        .select("doc_id")))
    assert(rows(docs.graft.tokenRarity("doc_id", "text")) ==
      rows(graft.operators.Relevance.tokenRarity(docs, "doc_id", "text")))
    assert(rows(docs.graft.chunkDocuments("doc_id", "text", 32)) ==
      rows(graft.operators.Packing.chunkDocuments(docs, "doc_id", "text", 32)))
    val bench = docs.where(col("doc_id") % 17 === 0)
    val corp = docs.where(col("doc_id") % 17 =!= 0)
    assert(rows(corp.graft.decontaminate("doc_id", "text", bench, "doc_id", "text", k = 5)) ==
      rows(graft.operators.Contamination.decontaminate(
        corp, "doc_id", "text", bench, "doc_id", "text", k = 5)))
    val emb = graft.sources.Tables.table(spark, TestSpark.sf0001, "embeddings")
    val benchV = emb.where(col("vec_id") % 13 === 0)
    val corpV = emb.where(col("vec_id") % 13 =!= 0)
    assert(rows(corpV.graft.semanticDecontaminate("vec_id", "embedding", benchV, "embedding", 0.4)
        .select("vec_id")) ==
      rows(graft.operators.Contamination.semanticDecontaminate(
        corpV, "vec_id", "embedding", benchV, "embedding", 0.4).select("vec_id")))
    val li = graft.sources.Tables.table(spark, TestSpark.sf0001, "lineitem")
    assert(rows(li.graft.standardize(Seq("l_quantity")).select("l_orderkey", "l_quantity_z")) ==
      rows(graft.operators.Profiling.standardize(li, Seq("l_quantity"))
        .select("l_orderkey", "l_quantity_z")))
    val ev = graft.sources.Tables.table(spark, TestSpark.sf0001, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    val evL = ev.select("event_id", "user_id", "ts")
    assert(rows(evL.graft.asofJoin(purchases, "user_id", "ts", "ts",
        Map("value" -> "v"), direction = "nearest")) ==
      rows(graft.operators.AsofJoin.nearest(evL, purchases, "user_id", "ts", "ts",
        Map("value" -> "v"))))
    assertThrows[IllegalArgumentException](
      evL.graft.asofJoin(purchases, "user_id", "ts", "ts", Map("value" -> "v"),
        direction = "sideways"))
    assert(rows(emb.graft.semanticDedupe("vec_id", "embedding", minCosine = 0.45,
        nlist = 4, refineIters = 1).select("vec_id")) ==
      rows(graft.operators.NearDup.semanticDedupe(emb, "vec_id", "embedding",
        minCosine = 0.45, nlist = 4, refineIters = 1).select("vec_id")))
    assert(rows(docs.graft.topTokens("text", k = 5, capacity = 64)) ==
      rows(graft.operators.HeavyHitters.topTokens(docs, "text", k = 5,
        capacity = 64)))
    assert(rows(docs.graft.lmScore("doc_id", "text").select("doc_id", "n_bigrams")) ==
      rows(graft.operators.LanguageModel.selfScore(docs, "doc_id", "text")
        .select("doc_id", "n_bigrams")))
    locally {
      implicit val sp: org.apache.spark.sql.SparkSession = spark
      val media = graft.operators.Multimodal.synthesize(
        docs.select("doc_id").limit(30), "doc_id")
      assert(rows(media.graft.imageNearDups(maxBits = 2)) ==
        rows(graft.operators.Multimodal.imageNearDupPairs(media, maxBits = 2)))
    }
    assert(rows(docs.graft.htmlExtract("text").select("doc_id", "text")) ==
      rows(docs.select(col("doc_id"),
        graft.functions.Scrub.htmlToText(col("text")).as("text"))))
  }

  test("round-12 verbs delegate 1:1 (importance, fusion, funnel, zipf, jsd)") {
    val en = docs.where(col("lang") === "en")
    assert(rows(docs.graft.importanceWeights("doc_id", "text", en, docs)) ==
      rows(graft.operators.ImportanceWeights
        .importanceWeights(docs, "doc_id", "text", en, docs)))
    val scored = docs.select(col("doc_id"),
      col("n_chars").cast("double").as("w"))
    assert(rows(scored.graft.gumbelTopK("doc_id", "w", 10)) ==
      rows(graft.operators.ImportanceWeights.gumbelTopK(scored, "doc_id", "w", 10)))
    assert(rows(scored.graft.rankFusion("doc_id", Seq("w"))) ==
      rows(graft.operators.Selection.reciprocalRankFusion(scored, "doc_id", Seq("w"))))
    val stages = Seq("big" -> (col("n_chars") >= 100))
    assert(rows(docs.graft.filterFunnel(stages)) ==
      rows(graft.operators.Profiling.filterFunnel(docs, stages)))
    assert(rows(docs.graft.zipfFit("text", 50)) ==
      rows(graft.operators.Relevance.zipfFit(docs, "text", 50)))
    assert(rows(docs.graft.vocabDivergence("lang", "text")) ==
      rows(graft.operators.Relevance.vocabJsDivergence(docs, "lang", "text")))
  }

  test("compaction/diff/novelty verbs delegate 1:1") {
    val ev = graft.sources.Tables.table(spark, TestSpark.sf0001, "events")
    assert(rows(ev.graft.keepLatest(Seq("user_id"), Seq("ts", "event_id"))) ==
      rows(graft.operators.Dedup.keepLatest(ev, Seq("user_id"), Seq("ts", "event_id"))))
    assert(rows(ev.graft.topKPerGroup(Seq("user_id"), "value", "event_id", 2)) ==
      rows(graft.operators.Selection.topKPerGroup(ev, Seq("user_id"), "value", "event_id", 2)))
    assert(rows(ev.graft.topKRowsPerGroup(Seq("user_id"), Seq("value", "event_id"), 2)) ==
      rows(graft.operators.Selection.topKPerGroupRows(ev, Seq("user_id"), Seq("value", "event_id"), 2)))
    val old = docs.where(col("doc_id") % 11 =!= 3).select("doc_id", "text")
    val neu = docs.where(col("doc_id") % 13 =!= 5).select("doc_id", "text")
    assert(rows(neu.graft.diffAgainst(old, "doc_id", Seq("text"))) ==
      rows(graft.operators.Dedup.snapshotDiff(old, neu, "doc_id", Seq("text"))))
    val bench = docs.where(col("doc_id") % 17 === 0)
    val corp = docs.where(col("doc_id") % 17 =!= 0)
    assert(rows(corp.graft.noveltyAgainst(bench, "doc_id", "text", "text", k = 5)) ==
      rows(graft.operators.Contamination.noveltyFractions(
        corp, "doc_id", "text", bench, "text", k = 5)))
  }

  test("round-13 verbs delegate 1:1 (edit pairs, weighted sample, train+score)") {
    import org.apache.spark.sql.functions.col
    val named = docs.selectExpr("doc_id", "substring(text, 1, 12) AS nm", "n_chars")
    assert(rows(named.graft.editDistancePairs("doc_id", "nm", 1)) ==
      rows(graft.operators.FuzzyJoin.editDistanceSelfPairs(named, "doc_id", "nm", 1)))
    assert(rows(named.graft.weightedSample("doc_id", col("n_chars"), 20)) ==
      rows(graft.operators.Sampling.weightedSample(named, "doc_id", col("n_chars"), 20)))
    val labeled = docs.selectExpr("doc_id",
      "CAST(n_chars AS DOUBLE) AS f1",
      "CAST(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END AS DOUBLE) AS y")
    val scored = labeled.graft.trainAndScore(Seq("f1"), "y", iters = 10)
    assert(scored.columns.contains("keep") && scored.count() == labeled.count())
  }

  test("round-16 verbs delegate 1:1: cartography, rhoLossSelect, materializeEpochs, precisionThresholds") {
    val probs = docs.selectExpr("doc_id",
      "CAST((doc_id * 37) % 101 AS DOUBLE) / 100.0 AS p")
    assert(rows(probs.graft.cartography("doc_id", "p")) ==
      rows(graft.operators.TrainingDynamics.cartography(probs, "doc_id", "p")))
    val losses = docs.selectExpr("doc_id", "lang",
      "CAST(n_chars % 97 AS DOUBLE) AS tl", "CAST(n_chars % 89 AS DOUBLE) AS il")
    assert(rows(losses.graft.rhoLossSelect("doc_id", "tl", "il", Seq("lang"), 5)) ==
      rows(graft.operators.TrainingDynamics.rhoLossSelect(
        losses, "doc_id", "tl", "il", Seq("lang"), 5)))
    import spark.implicits._
    val eps = Seq(("en", 1.5)).toDF("lang", "epochs")
    assert(rows(docs.select("doc_id", "lang").graft
        .materializeEpochs("doc_id", "lang", eps)) ==
      rows(graft.operators.Sampling.materializeEpochs(
        docs.select("doc_id", "lang"), "doc_id", "lang", eps)))
    val scored = docs.selectExpr("doc_id", "source",
      "CAST((doc_id * 11) % 101 AS DOUBLE) / 100.0 AS s",
      "CAST(CASE WHEN (doc_id * 29) % 101 < (doc_id * 11) % 101 THEN 1 ELSE 0 END AS BIGINT) AS y")
    assert(rows(scored.graft.precisionThresholds("source", "s", "y", 0.7)) ==
      rows(graft.operators.Selection.precisionThresholdPerGroup(
        scored, "source", "s", "y", 0.7)))
  }

  test("verbs chain into a pipeline and stay lazy") {
    // (not c4Filter here: the synthetic corpus has no terminal punctuation,
    // so C4's line rule correctly drops every doc — pinned in ScrubSpec)
    val out = docs.graft
      .redactPii("text")
      .graft.dedupeExact(Seq("text"), "doc_id")
      .graft.splitAssign("doc_id", Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .graft.epochShuffle("doc_id", "ep0")
    assert(out.columns.contains("split"))
    val n = out.count()
    assert(n > 0 && n <= docs.count())
  }
}
