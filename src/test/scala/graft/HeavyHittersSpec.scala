package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Misra–Gries heavy hitters: sketch guarantees on a skewed fixture, the
  * certified two-pass exact top-k, and the uncertifiable failure path. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Skewed fixture with exactly known counts: four heavy terms
    * (100/80/60/40) over a 50-term singleton tail; n = 330. */
  private def skewed: DataFrame = {
    import spark.implicits._
    val rows = Seq("alpha" -> 100, "beta" -> 80, "gamma" -> 60, "delta" -> 40)
      .flatMap { case (t, c) => Seq.fill(c)(t) } ++
      (0 until 50).map(i => f"tail$i%02d")
    rows.toDF("token")
  }

  private def exactTopK(df: DataFrame, k: Int): Seq[(String, Long)] =
    df.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(k).toSeq

  test("MG sketch: under-estimates within n/(cap+1); every heavy term present") {
    val n = 330L
    val cap = 8
    val sk = HeavyHitters.sketch(skewed, "token", cap).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.size <= cap)
    val truth = Map("alpha" -> 100L, "beta" -> 80L, "gamma" -> 60L, "delta" -> 40L)
      .withDefaultValue(1L)
    val bound = n / (cap + 1)  // = 36
    truth.take(4).foreach { case (t, c) =>
      assert(sk.contains(t), s"heavy term $t (count $c > $bound) must survive")
    }
    sk.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t over-counted: est $est > true ${truth(t)}")
      assert(truth(t) - est <= bound, s"$t under-counted beyond the bound")
    }
  }

  test("sketch with capacity >= vocabulary is the exact frequency table") {
    val sk = HeavyHitters.sketch(skewed, "token", 128).collect()
    val n = sk.head.getLong(2)
    assert(n == 330L)
    assert(sk.map(_.getLong(1)).sum == n, "nothing discarded => sum(est) == n")
    val m = sk.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("alpha") == 100L && m("beta") == 80L && m("tail07") == 1L)
  }

  test("two-pass certified top-k equals the plain groupBy top-k; partitioning-invariant") {
    val want = exactTopK(skewed, 4)
    def got(df: DataFrame): Seq[(String, Long)] =
      HeavyHitters.topKExact(df, "token", k = 4, capacity = 8)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 4th count 40 > missBound 330/9 = 36 — certified at capacity 8
    assert(got(skewed) == want)
    assert(got(skewed.repartition(13)) == want,
      "certified result must not depend on partitioning")
  }

  test("uncertifiable parameterization throws; best-effort opt-out returns exact counts") {
    import spark.implicits._
    // flat worst case: 50 distinct tokens x2 each, n=100, cap=8 =>
    // missBound 11 > every count — nothing is provable
    val flat = (0 until 50).flatMap(i => Seq.fill(2)(f"t$i%02d")).toDF("token")
    val e = intercept[IllegalStateException](
      HeavyHitters.topKExact(flat, "token", k = 3, capacity = 8))
    assert(e.getMessage.contains("not certifiable"))
    val best = HeavyHitters.topKExact(flat, "token", k = 3, capacity = 8,
      requireCertified = false).collect()
    // best-effort may return fewer than k (flat input can wipe the sketch),
    // but whatever candidates survive carry EXACT counts (pass 2 recounts)
    assert(best.length <= 3)
    best.foreach(r => assert(r.getLong(1) == 2L))
  }

  test("cmsEstimates: over-count-only guarantee, eps bound, determinism") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // skewed corpus: key k_i with frequency ~ 1/i plus noise keys
    val rows = (1 to 20).flatMap(i => Seq.fill(400 / i)(s"k$i")) ++
      (1 to 500).map(i => s"noise${rnd.nextInt(3000)}")
    val df = rows.toDF("k").repartition(7)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size
    val keys = (1 to 20).map(i => s"k$i") ++ Seq("never_seen")
    val got = HeavyHitters.cmsEstimates(df, "k", keys, eps = 0.01,
      confidence = 0.99)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val ex = exact.getOrElse(k, 0L)
      assert(got(k) >= ex, s"$k: est ${got(k)} must over-count exact $ex")
      assert(got(k) <= ex + math.ceil(0.01 * n * 3).toLong,
        s"$k: est ${got(k)} blew the eps bound vs $ex (n=$n)")
    }
    // fixed seed ⇒ bit-identical estimates at any partitioning (merge is
    // counter addition, commutative)
    val again = HeavyHitters.cmsEstimates(df.coalesce(1), "k", keys,
      eps = 0.01, confidence = 0.99)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("cmsTokenEstimates folds case and handles empty input") {
    import spark.implicits._
    val docs = Seq((1L, "The the THE cat"), (2L, "the dog")).toDF("doc_id", "text")
    val got = HeavyHitters.cmsTokenEstimates(docs, "text", Seq("THE", "cat"),
      eps = 0.001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("the") >= 4L && got("cat") >= 1L)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val z = HeavyHitters.cmsTokenEstimates(empty, "text", Seq("x"))
      .collect().map(_.getLong(1))
    assert(z.toSeq == Seq(0L))
  }

  test("topTokens over document text matches the SQL-shaped exact top-k") {
    val docs = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
    val toks = docs.select(explode(transform(
      graft.functions.TextAnalysis.tokens(col("text")), t => lower(t))).as("token"))
    val want = exactTopK(toks, 10)
    val got = HeavyHitters.topTokens(docs, "text", k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }
}
