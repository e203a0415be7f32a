package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ImportanceWeights, Sampling}

/** Pins for DSIR-style importance weighting (ImportanceWeights): the
  * explicit-unigram fit against closed-form hand counts, OOV and empty-doc
  * handling, the hashed fit against a naive in-JVM reimplementation, and
  * Gumbel-top-k determinism. */
class ImportanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratioMap(m: ImportanceWeights.RatioModel): Map[String, Double] =
    m.ratios.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("unigramLogRatios matches the closed-form add-one ratios") {
    // target: "a a b" (n_t=3), raw: "a c c c" (n_r=4), vocab = {a,b,c} (V=3)
    val target = Seq((1L, "a a b")).toDF("doc_id", "text")
    val raw = Seq((2L, "a c c c")).toDF("doc_id", "text")
    val m = ImportanceWeights.unigramLogRatios(target, raw, "text")
    val got = ratioMap(m)
    def lr(ct: Long, cr: Long): Double =
      math.log(((ct + 1.0) / (3 + 3.0)) / ((cr + 1.0) / (4 + 3.0)))
    assert(got.keySet == Set("a", "b", "c"))
    assert(math.abs(got("a") - lr(2, 1)) < 1e-12)
    assert(math.abs(got("b") - lr(1, 0)) < 1e-12)
    assert(math.abs(got("c") - lr(0, 3)) < 1e-12)
    val t = m.totals.collect().head
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == ((3L, 4L, 3L)))
  }

  test("score sums per-token ratios, routes OOV tokens, keeps empty docs") {
    val target = Seq((1L, "a a b")).toDF("doc_id", "text")
    val raw = Seq((2L, "a c c c")).toDF("doc_id", "text")
    val m = ImportanceWeights.unigramLogRatios(target, raw, "text")
    // doc 10: "a b" (both in vocab); doc 11: "zzz" (OOV); doc 12: whitespace only
    val docs = Seq((10L, "a b"), (11L, "zzz"), (12L, "   "))
      .toDF("doc_id", "text")
    val out = ImportanceWeights.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
    def lr(ct: Long, cr: Long): Double =
      math.log(((ct + 1.0) / 6.0) / ((cr + 1.0) / 7.0))
    val oov = math.log((1.0 / 6.0) / (1.0 / 7.0))
    assert(out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - (lr(2, 1) + lr(1, 0))) < 1e-12)
    assert(out(1).getLong(1) == 1L)
    assert(math.abs(out(1).getDouble(2) - oov) < 1e-12)
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("hashedLogRatios + hashed score match a naive in-JVM reimplementation") {
    val target = Seq((1L, "the cat sat"), (2L, "the dog sat still")).toDF("doc_id", "text")
    val raw = Seq((3L, "stock market index fell"), (4L, "the index rose")).toDF("doc_id", "text")
    val docs = Seq((5L, "the cat index"), (6L, "unseen words here")).toDF("doc_id", "text")
    val b = 64
    val m = ImportanceWeights.hashedLogRatios(target, raw, "text", b,
      ngramOrders = Seq(1))
    val got = ImportanceWeights.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap

    // naive ground truth: same xxhash64 buckets pulled from Spark (the hash
    // is Spark-defined), counts and smoothing redone with plain Scala maps
    def bucketsOf(rows: Seq[(Long, String)]): Seq[Long] = rows
      .toDF("doc_id", "text")
      .select(explode(transform(
        filter(split(col("text"), "\\s+"), t => length(t) > 0), t => lower(t))).as("t"))
      .select(pmod(xxhash64(col("t")), lit(b.toLong)).as("bkt"))
      .collect().map(_.getLong(0)).toSeq
    val tb = bucketsOf(Seq((1L, "the cat sat"), (2L, "the dog sat still")))
    val rb = bucketsOf(Seq((3L, "stock market index fell"), (4L, "the index rose")))
    val tc = tb.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rc = rb.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def lr(bkt: Long): Double =
      math.log(((tc.getOrElse(bkt, 0L) + 1.0) / (tb.size + b.toDouble)) /
        ((rc.getOrElse(bkt, 0L) + 1.0) / (rb.size + b.toDouble)))
    val d5 = bucketsOf(Seq((5L, "the cat index"))).map(lr).sum
    val d6 = bucketsOf(Seq((6L, "unseen words here"))).map(lr).sum
    assert(math.abs(got(5L) - d5) < 1e-9)
    assert(math.abs(got(6L) - d6) < 1e-9)
  }

  test("unigram+bigram hashed features match a naive n-gram recount") {
    val target = Seq((1L, "the cat sat down")).toDF("doc_id", "text")
    val raw = Seq((2L, "the dog sat"), (3L, "cat nap")).toDF("doc_id", "text")
    val docs = Seq((5L, "the cat sat"), (6L, "x")).toDF("doc_id", "text")
    val b = 128
    val m = ImportanceWeights.hashedLogRatios(target, raw, "text", b,
      ngramOrders = Seq(1, 2))
    val got = ImportanceWeights.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // naive: unigrams + space-joined bigrams, buckets pulled from Spark
    def feats(text: String): Seq[String] = {
      val ts = text.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase).toSeq
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val allFeats = (Seq("the cat sat down") ++ Seq("the dog sat", "cat nap") ++
      Seq("the cat sat", "x")).flatMap(feats).distinct
    val bucketOfFeat = allFeats.toDF("f")
      .select(col("f"), pmod(xxhash64(col("f")), lit(b.toLong)).as("bkt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tc = feats("the cat sat down").groupBy(bucketOfFeat)
      .view.mapValues(_.size.toLong).toMap
    val rFeats = feats("the dog sat") ++ feats("cat nap")
    val rc = rFeats.groupBy(bucketOfFeat).view.mapValues(_.size.toLong).toMap
    val (nT, nR) = (feats("the cat sat down").size.toDouble, rFeats.size.toDouble)
    def lr(bkt: Long): Double =
      math.log(((tc.getOrElse(bkt, 0L) + 1.0) / (nT + b)) /
        ((rc.getOrElse(bkt, 0L) + 1.0) / (nR + b)))
    val d5 = feats("the cat sat").map(f => lr(bucketOfFeat(f)))
    val d6 = feats("x").map(f => lr(bucketOfFeat(f)))
    assert(got(0)._2 == d5.size.toLong, "instances = unigrams + bigrams")
    assert(math.abs(got(0)._3 - d5.sum) < 1e-9)
    assert(got(1)._2 == d6.size.toLong && got(1)._2 == 1L)
    assert(math.abs(got(1)._3 - d6.sum) < 1e-9)
  }

  test("gumbelTopK plans as TakeOrdered — no global sort at any scale") {
    val scored = (1L to 50L).map(i => (i, i.toDouble))
      .toDF("doc_id", "log_weight")
    val plan = ImportanceWeights.gumbelTopK(scored, "doc_id", "log_weight", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan was:\n$plan")
  }

  test("gumbelTopK is deterministic, ranked by weight+noise, and caps at k") {
    val scored = (1L to 200L).map(i => (i, (i % 13).toDouble))
      .toDF("doc_id", "log_weight")
    val a = ImportanceWeights.gumbelTopK(scored, "doc_id", "log_weight", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val b2 = ImportanceWeights.gumbelTopK(scored.repartition(7), "doc_id",
      "log_weight", 20).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b2 && a.size == 20)
    // matches the naive driver-side computation of the same keys
    val want = (1L to 200L).map { i =>
      val u = math.max(new java.math.BigInteger(
        org.apache.commons.codec.digest.DigestUtils.sha256Hex(i.toString)
          .substring(0, 8), 16).doubleValue() / 4294967296.0, 1e-12)
      val key = (i % 13).toDouble - math.log(-math.log(u))
      (math.floor(key * 10000 + 0.5) / 10000, i)
    }.sortBy { case (k, id) => (-k, id) }.take(20).map(_._2)
    assert(a == want)
    // k beyond the corpus returns everything, still ordered
    val all = ImportanceWeights.gumbelTopK(scored, "doc_id", "log_weight", 500)
    assert(all.count() == 200L)
  }
}
