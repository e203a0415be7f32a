package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Contrastive

/** Pins [[Contrastive.cropPairs]]: crops are literal token subspans,
  * lengths respect the fraction band, starts stay in range, the overlap is
  * the exact position-interval intersection, everything is content-keyed
  * deterministic (partitioning-invariant, salt-sensitive). */
class ContrastiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (1L to 60L)
    .map(i => i -> (1 to (3 + (i % 37).toInt))
      .map(j => s"w${i}_$j").mkString(" "))

  private def run(salt: String = "crop") =
    Contrastive.cropPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        salt = salt)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getString(6), r.getString(7), r.getLong(8)))
      .toMap

  test("crops are exact token subspans with in-band lengths and overlap") {
    val out = run()
    docs.foreach { case (i, text) =>
      val toks = text.split("\\s+").toSeq
      val (n, as, al, bs, bl, ca, cb, ov) = out(i)
      assert(n == toks.size)
      for ((s, l, c) <- Seq((as, al, ca), (bs, bl, cb))) {
        assert(l >= 1 && l <= math.max(1, math.floor(n * 0.5).toLong),
          s"doc $i len $l of $n")
        assert(s >= 0 && s + l <= n)
        assert(c == toks.slice(s.toInt, (s + l).toInt).mkString(" "),
          s"doc $i crop mismatch")
      }
      assert(ov == math.max(0L, math.min(as + al, bs + bl) - math.max(as, bs)))
    }
  }

  test("content-keyed: partitioning-invariant and salt-sensitive") {
    val df = docs.toDF("doc_id", "text")
    val a = Contrastive.cropPairs(df.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Contrastive.cropPairs(df.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val other = run(salt = "crop2")
    val base = run()
    assert(docs.count { case (i, _) => base(i) != other(i) } > 40,
      "a different salt must move most crops")
  }

  test("empty and single-token documents are total") {
    val out = Contrastive.cropPairs(
        Seq((1L, ""), (2L, "only")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(6),
        r.getString(7)))
    assert(out(0) == ((1L, 0L, "", "")))
    assert(out(1)._2 == 1L && out(1)._3 == "only" && out(1)._4 == "only")
  }

  test("guards reject a bad fraction band") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Contrastive.cropPairs(df, "doc_id", "text", minFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      Contrastive.cropPairs(df, "doc_id", "text", minFrac = 0.6, maxFrac = 0.5)
    }
  }
}
