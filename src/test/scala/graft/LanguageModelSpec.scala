package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.LanguageModel

/** Stupid-backoff bigram LM: hand-computed scores on a tiny corpus, all
  * three backoff branches, short-doc contract, partitioning invariance. */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // corpus: c1 = {a:3, b:3, c:1, x:1}, N = 8;
  // c2 = {(a,b):3, (b,a):1, (b,c):1}
  private def corpus = {
    import spark.implicits._
    Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
  }

  private def scoreMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Option[Double])] =
    df.collect().map { case Row(id: Long, nb: Long, s) =>
      id -> (nb, Option(s).map(_.asInstanceOf[Double]))
    }.toMap

  test("self-score matches hand-computed stupid-backoff values; short docs keep NULL") {
    val got = scoreMap(LanguageModel.selfScore(corpus, "doc_id", "text"))
    // doc1 positions: (a,b)=3/3, (b,a)=1/3, (a,b)=3/3, (b,c)=1/3
    val third = math.log10(1.0 / 3.0)
    assert(got(1L)._1 == 4L)
    assert(math.abs(got(1L)._2.get - third / 2.0) < 1e-12)
    // doc2: single seen bigram at probability 1 → score 0
    assert(got(2L) == (1L, Some(0.0)))
    // one token / zero tokens: unscored but present
    assert(got(3L) == (0L, None))
    assert(got(4L) == (0L, None))
  }

  test("cross-corpus scoring exercises the unigram-backoff and OOV branches") {
    import spark.implicits._
    val lm = LanguageModel.trainBigram(corpus, "text")
    val fresh = Seq((10L, "a q b")).toDF("doc_id", "text")
    val got = scoreMap(LanguageModel.scoreStupidBackoff(fresh, "doc_id", "text", lm))
    // (a,q): OOV w2 → 0.4/8; (q,b): known w2 → (0.4*3)/8
    val want = (math.log10(0.4 / 8.0) + math.log10(0.4 * 3.0 / 8.0)) / 2.0
    assert(got(10L)._1 == 2L)
    assert(math.abs(got(10L)._2.get - want) < 1e-12)
  }

  test("trained tables are exact counts; N is their sum") {
    val lm = LanguageModel.trainBigram(corpus, "text")
    val uni = lm.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "x" -> 1L))
    val big = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    assert(lm.nTokens.head().getLong(0) == 8L)
  }

  test("scores are partitioning-invariant on the driver corpus") {
    val docs = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
      .limit(200)
    val a = scoreMap(LanguageModel.selfScore(docs, "doc_id", "text"))
    val b = scoreMap(LanguageModel.selfScore(docs.repartition(13), "doc_id", "text"))
    assert(a.keySet == b.keySet)
    // doubles: per-doc sums may fold in different order across partitionings;
    // equality within an ulp-scale tolerance is the honest pin
    a.foreach { case (id, (nb, s)) =>
      assert(b(id)._1 == nb)
      (s, b(id)._2) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"doc $id")
        case (x, y) => assert(x == y)
      }
    }
  }
}
