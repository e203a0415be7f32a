package graft

import org.apache.spark.sql.{Column, DataFrame}
import graft.operators._

/** Fluent entry point: `import graft.syntax._` and the whole operator
  * library hangs off any DataFrame —
  *
  * {{{
  * import graft.syntax._
  * corpus.graft
  *   .c4Filter("text")
  *   .dedupeExact(Seq("text"), tieBreaker = "doc_id")
  *   .dedupeAgainst(keptCorpus, _("text"))
  *   .stratifiedSample("source", "doc_id", perStratum = 50)
  * }}}
  *
  * Pure sugar: every method delegates 1:1 to the documented operator object
  * (where the semantics, oracle entries, and scale notes live) and returns a
  * plain DataFrame so graft steps interleave freely with native Spark ones.
  * Only the high-traffic pipeline verbs are surfaced; specialized calls
  * (IVF index builds, BPE training, PCA fits) stay on their objects, since
  * they produce model ARTIFACTS, not frames. */
object syntax {

  implicit class GraftDataFrame(private val df: DataFrame) extends AnyVal {
    def graft: GraftOps = new GraftOps(df)
  }

  final class GraftOps(private val df: DataFrame) extends AnyVal {

    // -- dedup ------------------------------------------------------------
    def dedupeExact(keyCols: Seq[String], tieBreaker: String): DataFrame =
      Dedup.exactKeepFirst(df, keyCols, tieBreaker)

    def dedupeAgainst(seen: DataFrame, key: DataFrame => Column): DataFrame =
      Dedup.dedupeAgainst(df, seen, key)

    def dedupeAgainstFuzzy(seen: DataFrame, idCol: String, textCol: String,
                           minJaccard: Double = 0.8): DataFrame =
      Dedup.dedupeAgainstFuzzy(df, seen, idCol, textCol, minJaccard)

    /** Keep-latest compaction: the current row per entity, one key-bounded
      * hash aggregate ([[graft.operators.Dedup.keepLatest]]). */
    def keepLatest(keyCols: Seq[String], versionCols: Seq[String]): DataFrame =
      Dedup.keepLatest(df, keyCols, versionCols)

    /** Snapshot diff vs an older snapshot: per-id added/removed/changed/
      * unchanged ([[graft.operators.Dedup.snapshotDiff]] with `df` as the
      * NEW side). */
    def diffAgainst(oldSnapshot: DataFrame, idCol: String,
                    compareCols: Seq[String]): DataFrame =
      Dedup.snapshotDiff(oldSnapshot, df, idCol, compareCols)

    /** Per-doc fraction of k-gram shingles unseen in `reference`
      * ([[graft.operators.Contamination.noveltyFractions]]). */
    def noveltyAgainst(reference: DataFrame, idCol: String, textCol: String,
                       refTextCol: String, k: Int = 8): DataFrame =
      Contamination.noveltyFractions(df, idCol, textCol, reference,
        refTextCol, k)

    def fuzzyClusterDedup(idCol: String, textCol: String,
                          minJaccard: Double = 0.8): DataFrame =
      Dedup.keepClusterRepresentatives(df, idCol,
        NearDup.nearDuplicates(df, idCol, textCol, minJaccard))

    def semanticDedupe(idCol: String, vecCol: String,
                       minCosine: Double = 0.95, nlist: Int = 64,
                       refineIters: Int = 2, probes: Int = 1): DataFrame =
      NearDup.semanticDedupe(df, idCol, vecCol, minCosine, nlist,
        refineIters, probes)

    def topTokens(textCol: String, k: Int, capacity: Int,
                  requireCertified: Boolean = true): DataFrame =
      HeavyHitters.topTokens(df, textCol, k, capacity, requireCertified)

    def lmScore(idCol: String, textCol: String,
                alpha: Double = 0.4): DataFrame =
      LanguageModel.selfScore(df, idCol, textCol, alpha)

    def imageNearDups(maxBits: Int = 3): DataFrame = {
      implicit val sp: org.apache.spark.sql.SparkSession = df.sparkSession
      Multimodal.imageNearDupPairs(df, maxBits)
    }

    // -- cleaning / scoring ----------------------------------------------
    def htmlExtract(htmlCol: String): DataFrame = {
      import org.apache.spark.sql.functions.col
      df.withColumn(htmlCol, graft.functions.Scrub.htmlToText(col(htmlCol)))
    }

    def c4Filter(textCol: String, minLineWords: Int = 3,
                 minLines: Int = 3): DataFrame = {
      import org.apache.spark.sql.functions.col
      df.withColumn(textCol,
          graft.functions.Scrub.c4CleanText(col(textCol), minLineWords))
        .where(graft.functions.Scrub.c4Keep(col(textCol), minLineWords, minLines))
    }

    def redactPii(textCol: String): DataFrame =
      df.withColumn(textCol, graft.functions.Scrub.redactPii(
        org.apache.spark.sql.functions.col(textCol)))

    def scoreLinear(weights: Seq[(String, Double)], bias: Double,
                    threshold: Double = 0.0): DataFrame =
      graft.functions.Scoring.applyLinearModel(df, weights, bias, threshold)

    def tokenRarity(idCol: String, textCol: String): DataFrame =
      Relevance.tokenRarity(df, idCol, textCol)

    def bigramFluency(idCol: String, textCol: String): DataFrame =
      Relevance.bigramAssociation(df, idCol, textCol)

    def standardize(cols: Seq[String], suffix: String = "_z"): DataFrame =
      Profiling.standardize(df, cols, suffix)

    // -- decontamination --------------------------------------------------
    def decontaminate(idCol: String, textCol: String, bench: DataFrame,
                      benchId: String, benchText: String,
                      k: Int = 8, minShared: Int = 1): DataFrame =
      Contamination.decontaminate(df, idCol, textCol,
        bench, benchId, benchText, k, minShared)

    def semanticDecontaminate(idCol: String, vecCol: String,
                              bench: DataFrame, benchVec: String,
                              minCosine: Double): DataFrame =
      Contamination.semanticDecontaminate(df, idCol, vecCol,
        bench, benchVec, minCosine)

    // -- sampling / splits / order ---------------------------------------
    def bernoulliSample(keyCol: String, fraction: Double): DataFrame =
      Sampling.bernoulliByKey(df, keyCol, fraction)

    def stratifiedSample(stratumCol: String, keyCol: String,
                         perStratum: Int): DataFrame =
      Sampling.stratifiedQuota(df, stratumCol, keyCol, perStratum)

    def splitAssign(keyCol: String, splits: Seq[(String, Double)]): DataFrame =
      Sampling.splitAssign(df, keyCol, splits)

    def epochShuffle(keyCol: String, salt: String): DataFrame =
      Sampling.deterministicShuffle(df, keyCol, salt)

    // -- packing ----------------------------------------------------------
    def chunkDocuments(idCol: String, textCol: String,
                       maxTokens: Int, overlap: Int = 0): DataFrame =
      Packing.chunkDocuments(df, idCol, textCol, maxTokens, overlap)

    def packSequences(idCol: String, textCol: String, capacity: Long): DataFrame =
      Packing.packSequences(df, idCol,
        graft.functions.TextAnalysis.tokenCount(
          org.apache.spark.sql.functions.col(textCol)), capacity)

    // -- corpus selection & weighting -------------------------------------

    /** DSIR importance weights for every row, fitted target-vs-raw
      * ([[graft.operators.ImportanceWeights.importanceWeights]]). */
    def importanceWeights(idCol: String, textCol: String,
                          target: DataFrame, raw: DataFrame): DataFrame =
      ImportanceWeights.importanceWeights(df, idCol, textCol, target, raw)

    /** Deterministic Gumbel-top-k resample by a log-weight column
      * ([[graft.operators.ImportanceWeights.gumbelTopK]]). */
    def gumbelTopK(idCol: String, weightCol: String, k: Int): DataFrame =
      ImportanceWeights.gumbelTopK(df, idCol, weightCol, k)

    /** Reciprocal-rank fusion of incomparably-scaled quality signals
      * ([[graft.operators.Selection.reciprocalRankFusion]]). */
    def rankFusion(idCol: String, scoreCols: Seq[String],
                   k: Int = 60): DataFrame =
      Selection.reciprocalRankFusion(df, idCol, scoreCols, k)

    /** Top-k rows per group via the bounded-heap aggregate — no window
      * sort ([[graft.operators.Selection.topKPerGroup]]). */
    def topKPerGroup(groupCols: Seq[String], scoreCol: String,
                     idCol: String, k: Int): DataFrame =
      Selection.topKPerGroup(df, groupCols, scoreCol, idCol, k)

    /** Full-row top-k per group — payload carried through the heap, no
      * join-back ([[graft.operators.Selection.topKPerGroupRows]]). */
    def topKRowsPerGroup(groupCols: Seq[String], orderCols: Seq[String],
                         k: Int): DataFrame =
      Selection.topKPerGroupRows(df, groupCols, orderCols, k)

    /** One-scan per-stage attrition accounting for an ordered filter
      * cascade ([[graft.operators.Profiling.filterFunnel]]). */
    def filterFunnel(stages: Seq[(String, Column)]): DataFrame =
      Profiling.filterFunnel(df, stages)

    /** Zipf-law corpus-health fit over the top-N terms
      * ([[graft.operators.Relevance.zipfFit]]). */
    def zipfFit(textCol: String, topN: Int = 1000): DataFrame =
      Relevance.zipfFit(df, textCol, topN)

    /** Pairwise per-group vocabulary Jensen–Shannon divergence
      * ([[graft.operators.Relevance.vocabJsDivergence]]). */
    def vocabDivergence(groupCol: String, textCol: String): DataFrame =
      Relevance.vocabJsDivergence(df, groupCol, textCol)

    // -- fuzzy matching / sampling / training (round-13 surfaces) ---------

    /** Self edit-distance pairs (id_a < id_b, dist ≤ maxDist) via the
      * segment-banded join — see [[graft.operators.FuzzyJoin]]. */
    def editDistancePairs(idCol: String, strCol: String, maxDist: Int): DataFrame =
      FuzzyJoin.editDistanceSelfPairs(df, idCol, strCol, maxDist)

    /** Exact-k weight-proportional sample (A-ES exponential race) — see
      * [[graft.operators.Sampling.weightedSample]]. */
    def weightedSample(keyCol: String, weightCol: Column, k: Int,
                       salt: String = "aes"): DataFrame =
      Sampling.weightedSample(df, keyCol, weightCol, k, salt)

    /** Train a logistic-regression quality filter on this frame and score
      * it in place — [[graft.operators.LogisticRegression.train]] composed
      * with [[graft.functions.Scoring.applyLinearModel]]. */
    def trainAndScore(featureCols: Seq[String], labelCol: String,
                      iters: Int = 50): DataFrame = {
      val m = LogisticRegression.train(df, featureCols, labelCol, iters)
      graft.functions.Scoring.applyLinearModel(df, m.weights, m.bias)
    }

    // -- temporal joins ---------------------------------------------------

    /** Point-in-time join against `right` (the full pandas merge_asof
      * surface — see [[graft.operators.AsofJoin]] for semantics and the
      * cost model). `direction` is `"backward"` (default), `"forward"` or
      * `"nearest"`. */
    def asofJoin(right: DataFrame, by: String, leftTs: String, rightTs: String,
                 valueCols: Map[String, String],
                 direction: String = "backward",
                 joinType: String = "left",
                 tolerance: Option[Column] = None,
                 allowExactMatches: Boolean = true): DataFrame =
      direction match {
        case "backward" => AsofJoin.backward(df, right, by, leftTs, rightTs,
          valueCols, joinType, tolerance, allowExactMatches)
        case "forward" => AsofJoin.forward(df, right, by, leftTs, rightTs,
          valueCols, joinType, tolerance, allowExactMatches)
        case "nearest" => AsofJoin.nearest(df, right, by, leftTs, rightTs,
          valueCols, joinType, tolerance, allowExactMatches)
        case other => throw new IllegalArgumentException(
          s"direction must be backward|forward|nearest, got '$other'")
      }

    /** [[graft.operators.TrainingDynamics.cartography]] on this frame. */
    def cartography(idCol: String, probCol: String,
                    confSplit: Double = 0.5,
                    varSplit: Double = 0.2): DataFrame =
      TrainingDynamics.cartography(df, idCol, probCol, confSplit, varSplit)

    /** [[graft.operators.TrainingDynamics.rhoLossSelect]] on this frame. */
    def rhoLossSelect(idCol: String, trainLossCol: String,
                      irreducibleLossCol: String, groupCols: Seq[String],
                      k: Int): DataFrame =
      TrainingDynamics.rhoLossSelect(df, idCol, trainLossCol,
        irreducibleLossCol, groupCols, k)

    /** [[graft.operators.Sampling.materializeEpochs]] on this frame. */
    def materializeEpochs(keyCol: String, groupCol: String,
                          epochs: DataFrame,
                          epochsCol: String = "epochs",
                          salt: String = "epoch"): DataFrame =
      Sampling.materializeEpochs(df, keyCol, groupCol, epochs, epochsCol, salt)

    /** [[graft.operators.Selection.precisionThresholdPerGroup]] on this
      * frame. */
    def precisionThresholds(groupCol: String, scoreCol: String,
                            labelCol: String,
                            targetPrecision: Double): DataFrame =
      Selection.precisionThresholdPerGroup(df, groupCol, scoreCol, labelCol,
        targetPrecision)
  }
}
