package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, SimilaritySearch}

/** Pins for the retrieval planning/evaluation pair: the LSH banding-plan
  * closed forms against hand arithmetic, the recommended-plan tie rule,
  * and Matryoshka truncation recall on constructed vectors where the
  * truncated neighbor order provably flips. */
class RetrievalEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lshPlan enumerates divisor pairs with the S-curve closed forms") {
    val out = NearDup.lshPlan(spark, 4, targetJaccard = 0.7,
      probeJaccards = Seq(0.8)).orderBy("bands").collect()
    // divisors of 4: (1,4), (2,2), (4,1)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 4L), (2L, 2L), (4L, 1L)))
    // thresholds: 1^(1/4)=1, (1/2)^(1/2)=0.70710..., (1/4)^1=0.25
    assert(out(0).getDouble(2) == 1.0)
    assert(math.abs(out(1).getDouble(2) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - 0.25) < 1e-12)
    // recommended: |0.7071-0.7| smallest -> (2,2) only
    assert(out.map(_.getBoolean(3)).toSeq == Seq(false, true, false))
    // p_candidate at j=0.8: 1-(1-0.8^r)^b
    assert(math.abs(out(1).getDouble(5) -
      (1.0 - math.pow(1.0 - 0.64, 2))) < 1e-12)
    assert(math.abs(out(2).getDouble(5) -
      (1.0 - math.pow(1.0 - math.pow(0.8, 1), 4))) < 1e-12)
  }

  test("lshPlan recommendation ties break toward fewer bands") {
    // numHashes=1: single pair (1,1), trivially recommended
    val one = NearDup.lshPlan(spark, 1, 0.5).collect()
    assert(one.forall(_.getBoolean(3)))
    intercept[IllegalArgumentException] { NearDup.lshPlan(spark, 0, 0.5) }
    intercept[IllegalArgumentException] { NearDup.lshPlan(spark, 4, 1.0) }
    intercept[IllegalArgumentException] {
      NearDup.lshPlan(spark, 4, 0.5, probeJaccards = Nil)
    }
  }

  test("matryoshkaRecall is 1.0 at full dims and catches truncation flips") {
    // 4-dim vectors: truncating to the first 2 dims makes id 3 look like
    // id 1's nearest neighbor even though id 2 is the true one.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f, 1.0f, 0.0f)),   // true NN of 1 (near-identical)
      (3L, Seq(1.0f, 0.0f, -1.0f, 0.0f)),  // same first half, opposite second
      (4L, Seq(0.0f, 1.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val full = SimilaritySearch.matryoshkaRecall(emb, "vec_id", "embedding",
      dims = 4, k = 1).orderBy("query_id").collect()
    assert(full.forall(_.getDouble(3) == 1.0),
      "full-dims truncation must reproduce the exact search")
    val trunc = SimilaritySearch.matryoshkaRecall(emb, "vec_id", "embedding",
      dims = 2, k = 1).orderBy("query_id").collect()
    // query 1 truncated: cos ties between 2 and 3 broken by corpus_id -> 2?
    // truncated vectors: 1=(1,0), 2=(1,.1), 3=(1,0), 4=(0,1).
    // query 1's truncated top-1 is id 3 (cos exactly 1.0 vs 2's 0.995) ->
    // misses the true neighbor 2 -> recall 0
    val r1 = trunc.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(3) == 0.0, s"expected truncation miss, got $r1")
    // query 4's neighbors are equally wrong in both spaces only if sets
    // differ; just pin the frame shape: n_exact = k for every query
    assert(trunc.forall(_.getLong(1) == 1L))
    intercept[IllegalArgumentException] {
      SimilaritySearch.matryoshkaRecall(emb, "vec_id", "embedding", 0, 1)
    }
  }
}
