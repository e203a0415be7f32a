package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Sennrich-style fixture: frequencies low:5, lower:2, newest:6, widest:3
  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest"))
    .toDF("doc_id", "text")

  /** Driver reference: the standard greedy lowest-rank-first apply. */
  private def applyRef(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    if (syms.isEmpty) return Nil
    syms = syms.init :+ (syms.last + "</w>")
    var done = false
    while (!done && syms.length > 1) {
      val cands = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
      if (cands.isEmpty) done = true
      else {
        val (_, (a, b)) = cands.minBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += (a + b); k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.toVector
      }
    }
    syms.map(s => if (s.endsWith("</w>")) s.dropRight(4) else s).filter(_.nonEmpty)
  }

  test("train learns the classic merges: 'es' then 'est' dominate the fixture") {
    val model = Bpe.train(corpus, "text", numMerges = 8)
    val first3 = model.merges.take(3)
    // est appears in newest(6) + widest(3) = 9 words: e+s (9) tops, then
    // es+t</w> (9; this trainer folds the end marker into the final char
    // symbol), then l+o from low(5)+lower(2) — the canonical BPE example
    // under the fused-marker convention
    assert(first3(0) == ("e", "s"), s"got $first3")
    assert(first3(1) == ("es", "t</w>"), s"got $first3")
    assert(first3(2) == ("l", "o"), s"got $first3")
  }

  test("native apply equals the driver reference on trained and unseen words") {
    val model = Bpe.train(corpus, "text", numMerges = 10)
    val probe = Seq((1L, "newest lowest widest low unseen zebra"),
      (2L, "LOWER Newest"), (3L, "")).toDF("id", "t")
    val got = Bpe.tokens(probe, "t", model, "tk")
      .select("id", "tk")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    def ref(text: String): List[String] =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .flatMap(w => applyRef(w, model.merges)).toList
    assert(got(1L) == ref("newest lowest widest low unseen zebra"))
    assert(got(2L) == ref("LOWER Newest"), "apply must case-fold like training")
    assert(got(3L) == Nil)
  }

  test("model is deterministic across partitionings; artifact round-trips") {
    val a = Bpe.train(corpus.repartition(7), "text", numMerges = 6)
    val b = Bpe.train(corpus.coalesce(1), "text", numMerges = 6)
    assert(a.merges == b.merges, "tie-breaks must make training partition-invariant")
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/model"
    Bpe.save(spark, a, path)
    assert(Bpe.load(spark, path).merges == a.merges)
  }

  test("tokenCount feeds packing: merged words need fewer tokens than characters") {
    val model = Bpe.train(corpus, "text", numMerges = 12)
    val counts = Bpe.tokenCount(corpus, "text", model, "n")
      .select("doc_id", "n").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // 'newest' x6 fully merges to one token per word once est/new merges land
    assert(counts(3L) <= 12, s"6 x 'newest' must compress well below char count: $counts")
    assert(counts.values.forall(_ > 0))
  }

  test("exhausted merge space stops early instead of looping") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(tiny, "text", numMerges = 100)
    // 'ab</w>' has pairs (a,b),(b,</w>) -> at most 2 merges exist
    assert(model.merges.length <= 2, s"got ${model.merges}")
  }

  test("incremental pair maintenance ≡ full recount (fixture + randomized corpora)") {
    val fixture = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    assert(Bpe.learnMerges(fixture, 10) == Bpe.learnMergesRecount(fixture, 10))
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { round =>
      // small alphabet → dense pair collisions, ties, and self-overlapping
      // runs ("aaa") — the cases where incremental deltas go wrong
      val freqs = (1 to 150).map { _ =>
        (1 to (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.groupBy(identity).map { case (w, g) =>
        (w, (g.size + rnd.nextInt(5)).toLong)
      }.toArray
      val inc = Bpe.learnMerges(freqs, 40)
      val rec = Bpe.learnMergesRecount(freqs, 40)
      assert(inc == rec, s"round $round: incremental diverged from recount")
    }
  }

  test("1k merges over a vocabulary-scale histogram train fast (incremental loop)") {
    val rnd = new scala.util.Random(7)
    val freqs = (1 to 20000).map { _ =>
      (1 to (3 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toArray
    val t0 = System.nanoTime()
    val merges = Bpe.learnMerges(freqs, 1000)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 1000, s"merge space must not exhaust: ${merges.length}")
    // the recount loop needs 1000 full passes over ~170k symbols here; the
    // incremental loop touches only affected types — generous CI bound
    assert(sec < 20.0, s"1k merges took ${sec}s — incremental maintenance regressed")
  }

  test("train and apply share one tokenization: U+3000/U+2028 whitespace") {
    // Round-6 skew: training split on Java \s+ (ASCII), apply on
    // Character.isWhitespace — a corpus word-separated by ideographic space
    // trained as ONE long word but applied as two. Now both paths run
    // through graft_bpe_words/graft_bpe_tokens' shared pre-tokenizer.
    val uni = Seq((1L, "newest　newest newest low")).toDF("doc_id", "text")
    val ascii = Seq((1L, "newest newest newest low")).toDF("doc_id", "text")
    val a = Bpe.train(uni, "text", numMerges = 6)
    val b = Bpe.train(ascii, "text", numMerges = 6)
    assert(a.merges == b.merges, "exotic whitespace must tokenize like ASCII space")
    val gotU = Bpe.tokens(uni, "text", a, "tk").select("tk").as[Seq[String]].head()
    val gotA = Bpe.tokens(ascii, "text", a, "tk").select("tk").as[Seq[String]].head()
    assert(gotU == gotA, s"apply must split U+3000 identically: $gotU vs $gotA")
  }
}
