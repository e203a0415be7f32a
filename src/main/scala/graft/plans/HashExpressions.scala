package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketching hot paths (SURVEY.md §7.3:
  * "promote to native Expression only if bench shows UDF overhead" — it did:
  * the higher-order-function formulations evaluate their lambdas interpreted,
  * per element; a MinHash signature is numHashes × |shingles| lambda calls
  * per row. These expressions make ONE call per row and run a primitive
  * `while` loop inside — ~20× faster at sf0.1, and the loop is exactly what
  * `doGenCode` would emit anyway (CodegenFallback costs one virtual call per
  * row here, not per element).
  */

/** `graft_minhash_sig(hashes ARRAY<BIGINT>, numHashes INT)` →
  * `ARRAY<BIGINT>`: sig[s] = min over h in hashes of xxh64(h, seed = s). */
case class MinHashSignatureExpr(hashes: Expression, numHashes: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = hashes
  override def right: Expression = numHashes
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(arr: Any, n: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val len = a.numElements()
    val nh = n.asInstanceOf[Int]
    val out = new Array[Long](nh)
    var s = 0
    while (s < nh) {
      var m = Long.MaxValue
      var i = 0
      while (i < len) {
        val h = XXH64.hashLong(a.getLong(i), s.toLong)
        if (h < m) m = h
        i += 1
      }
      out(s) = if (len == 0) 0L else m
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MinHashSignatureExpr =
    copy(hashes = l, numHashes = r)
}

/** `graft_simhash(tokens ARRAY<STRING>)` → BIGINT: 64-bit SimHash — bit i is
  * the sign of Σ_tokens (bit i of xxh64(token) ? +1 : −1). */
case class SimHash64Expr(tokens: Expression)
  extends UnaryExpression with CodegenFallback {

  override def child: Expression = tokens
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(arr: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val len = a.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < len) {
      val h = XXH64.hashUTF8String(a.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(tokens = c)
}

/** `graft_shingle_hashes(text STRING, k INT)` → `ARRAY<BIGINT>`: whitespace-
  * tokenize, then hash each k-gram of consecutive tokens as an xxh64 chain
  * over the token hashes (no shingle strings are ever materialized). Fewer
  * than k tokens → one hash over all tokens — mirroring
  * [[graft.operators.NearDup.shingles]]. */
case class ShingleHashesExpr(text: Expression, k: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = k
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(t: Any, kAny: Any): Any = {
    val s = t.toString
    val kk = kAny.asInstanceOf[Int]
    // whitespace-tokenize and hash tokens in one scan
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0; val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start)
        tokenHashes += XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(s.substring(start, i)), 42L)
    }
    val m = tokenHashes.length
    if (m < kk) {
      var h = 42L
      var j = 0
      while (j < m) { h = XXH64.hashLong(tokenHashes(j), h); j += 1 }
      new GenericArrayData(Array(h))
    } else {
      val out = new Array[Long](m - kk + 1)
      var p = 0
      while (p <= m - kk) {
        var h = 42L
        var j = p
        while (j < p + kk) { h = XXH64.hashLong(tokenHashes(j), h); j += 1 }
        out(p) = h
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ShingleHashesExpr = copy(text = l, k = r)
}

/** Standard Spark extensions entry point: registers the native functions at
  * session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignatureExpr].getName, "graft_minhash_sig"),
      exprs => MinHashSignatureExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash"),
      exprs => SimHash64Expr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      exprs => ShingleHashesExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_text_stats"),
      new ExpressionInfo(classOf[TextStatsExpr].getName, "graft_text_stats"),
      exprs => TextStatsExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "graft_lang_id"),
      exprs => LangIdExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      exprs => CosineSimilarityExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_nearest_cells"),
      new ExpressionInfo(classOf[NearestCentroidsExpr].getName, "graft_nearest_cells"),
      exprs => NearestCentroidsExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "graft_lsh_bucket"),
      exprs => HyperplaneBucketExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprintExpr].getName, "graft_winnow"),
      exprs => WinnowFingerprintExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("graft_nearest_dist"),
      new ExpressionInfo(classOf[NearestCentroidDistExpr].getName, "graft_nearest_dist"),
      exprs => NearestCentroidDistExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(classOf[PqEncodeExpr].getName, "graft_pq_encode"),
      exprs => PqEncodeExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_pq_lut"),
      new ExpressionInfo(classOf[PqLutExpr].getName, "graft_pq_lut"),
      exprs => PqLutExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[PqAdcExpr].getName, "graft_pq_adc"),
      exprs => PqAdcExpr(exprs(0), exprs(1))))
    // Spark's own bloom-filter pair (used internally by runtime join
    // filters) exposed as callable functions: the analyzer wraps the
    // AggregateFunction in an AggregateExpression on resolution.
    e.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_contains"),
      exprs => BloomFilterMightContain(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc"),
      exprs => NfcNormalizeExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLenExpr].getName, "graft_deflate_len"),
      exprs => DeflateLenExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokensExpr].getName, "graft_bpe_tokens"),
      exprs => BpeTokensExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_gramian"),
      new ExpressionInfo(classOf[GramianAggregate].getName, "graft_gramian"),
      exprs => GramianAggregate(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_bpe_words"),
      new ExpressionInfo(classOf[BpeWordsExpr].getName, "graft_bpe_words"),
      exprs => BpeWordsExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_pca_project"),
      new ExpressionInfo(classOf[PcaProjectExpr].getName, "graft_pca_project"),
      exprs => PcaProjectExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("graft_mg_sketch"),
      new ExpressionInfo(classOf[MisraGriesAggregate].getName, "graft_mg_sketch"),
      exprs => MisraGriesAggregate(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAggregate].getName, "graft_topk"),
      exprs => TopKAggregate(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("graft_unigram_tokens"),
      new ExpressionInfo(classOf[UnigramTokensExpr].getName, "graft_unigram_tokens"),
      exprs => UnigramTokensExpr(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("graft_latest"),
      new ExpressionInfo(classOf[LatestAggregate].getName, "graft_latest"),
      exprs => LatestAggregate(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_earliest"),
      new ExpressionInfo(classOf[LatestAggregate].getName, "graft_earliest"),
      exprs => LatestAggregate(exprs(0), exprs(1), earliest = true)))
    e.injectFunction((FunctionIdentifier("graft_topk_rows"),
      new ExpressionInfo(classOf[TopKRowsAggregate].getName, "graft_topk_rows"),
      exprs => TopKRowsAggregate(exprs(0), exprs(1), exprs(2))))
    e.injectFunction((FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllAggregate].getName, "graft_kll_agg"),
      exprs => KllAggregate(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[KllQuantileExpr].getName, "graft_kll_quantile"),
      exprs => KllQuantileExpr(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_kll_rank"),
      new ExpressionInfo(classOf[KllRankExpr].getName, "graft_kll_rank"),
      exprs => KllRankExpr(exprs(0), exprs(1))))
  }
}

object HashExpressions {
  /** Register the native functions in a session's registry (idempotent);
    * callers then use `functions.call_function("graft_minhash_sig", ...)`. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      exprs => MinHashSignatureExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHash64Expr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => ShingleHashesExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_text_stats",
      exprs => TextStatsExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id",
      exprs => LangIdExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimilarityExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_cells",
      exprs => NearestCentroidsExpr(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_lsh_bucket",
      exprs => HyperplaneBucketExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_winnow",
      exprs => WinnowFingerprintExpr(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_dist",
      exprs => NearestCentroidDistExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_encode",
      exprs => PqEncodeExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_lut",
      exprs => PqLutExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_adc",
      exprs => PqAdcExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalizeExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_deflate_len",
      exprs => DeflateLenExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_tokens",
      exprs => BpeTokensExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_gramian",
      exprs => GramianAggregate(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_words",
      exprs => BpeWordsExpr(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_pca_project",
      exprs => PcaProjectExpr(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_mg_sketch",
      exprs => MisraGriesAggregate(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_topk",
      exprs => TopKAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_unigram_tokens",
      exprs => UnigramTokensExpr(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_latest",
      exprs => LatestAggregate(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_earliest",
      exprs => LatestAggregate(exprs(0), exprs(1), earliest = true), "built-in")
    reg.createOrReplaceTempFunction("graft_topk_rows",
      exprs => TopKRowsAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_kll_agg",
      exprs => KllAggregate(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_kll_quantile",
      exprs => KllQuantileExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_kll_rank",
      exprs => KllRankExpr(exprs(0), exprs(1)), "built-in")
  }
}
