package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Repetition

/** Pins the assembled one-pass [[Repetition.signals]] sweep (and [[
  * Repetition.keep]]) bit-exactly against a driver-side reference walk on
  * random corpora, plus hand-computed fixtures per signal family and the
  * coverage no-double-count rule. The per-signal primitives have their own
  * RepetitionSpec; this spec also cross-checks that the sweep's coverage
  * semantics agree with dupNgramCoverage's positional union. */
class RepetitionSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sig(docs: Seq[(Long, String)],
                  topNs: Seq[Int] = Seq(2, 3, 4),
                  dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)) =
    Repetition.signals(docs.toDF("doc_id", "text"), "doc_id", "text",
        topNs, dupNs)
      .collect().map(r => r.getLong(0) ->
        r.schema.fieldNames.drop(1).map(f =>
          f -> r.getDouble(r.fieldIndex(f))).toMap).toMap

  test("hand-computed line/paragraph duplication") {
    val m = sig(Seq((1L, "a b\na b\nc d e\n\na b\na b\nc d e")))(1L)
    // lines: "a b"x4, "c d e"x2 -> dup units (4-1)+(2-1)=4 of 6
    assert(m("dup_line_frac") == 4.0 / 6.0)
    // chars: 3*4 + 5*2 = 22; dup chars 3*3 + 5*1 = 14
    assert(m("dup_line_char_frac") == 14.0 / 22.0)
    // paragraphs: the same 3-line block twice -> 1 dup of 2
    assert(m("dup_para_frac") == 1.0 / 2.0)
    assert(m("dup_para_char_frac") == 0.5)
  }

  test("hand-computed top-n-gram fraction and deterministic tie-break") {
    // tokens: a b a b c (tokchars=5); "a b" occurs 2x, chars 2 -> 2*2/5
    val m = sig(Seq((1L, "a b a b c")), topNs = Seq(2), dupNs = Nil)(1L)
    assert(m("top_2gram_char_frac") == 4.0 / 5.0)
    // all 2-grams unique: count ties at 1 -> more chars wins, then the
    // lexicographically LAST gram; "bb cc" (4 chars) beats "a bb"/"cc d"(3)
    val t = sig(Seq((2L, "a bb cc d")), topNs = Seq(2), dupNs = Nil)(2L)
    assert(t("top_2gram_char_frac") == 1.0 * 4.0 / 6.0)
  }

  test("duplicate-n-gram coverage never double-counts positions") {
    // a b a b a: both "a b" and "b a" are duplicated; naive char sum would
    // be 8, positional coverage is all 5 tokens
    val m = sig(Seq((1L, "a b a b a")), topNs = Nil, dupNs = Seq(2))(1L)
    assert(m("dup_2gram_char_frac") == 1.0)
    // c d e c d: "c d" duplicated at pos 0 and 3 -> covers {0,1,3,4} of 5
    val n = sig(Seq((2L, "c d e c d")), topNs = Nil, dupNs = Seq(2))(2L)
    assert(n("dup_2gram_char_frac") == 4.0 / 5.0)
  }

  test("sweep coverage matches dupNgramCoverage's covered-token chars") {
    // same positional-union semantics, different normalization: the sweep
    // divides by token chars, the primitive by raw text length — compare
    // the NUMERATORS (covered token characters)
    val docs = Seq(
      (1L, "q1 q2 q3 q4 q5 zz yy zz q1 q2 q3 q4 q5 ww"),
      (2L, "a b a b a b"),
      (3L, "u v w x y z"))
    val df = docs.toDF("doc_id", "text")
    val prim = Repetition.dupNgramCoverage(df, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sweep = sig(docs, topNs = Nil, dupNs = Seq(5))
    docs.foreach { case (i, text) =>
      val tokchars = text.split("\\s+").filter(_.nonEmpty).map(_.length).sum
      assert(sweep(i)("dup_5gram_char_frac") * tokchars ==
        prim.getOrElse(i, 0L).toDouble, s"doc $i")
    }
  }

  test("degenerate documents read 0.0 everywhere") {
    val m = sig(Seq((1L, ""), (2L, "   \n  \n"), (3L, "one")))
    for (id <- Seq(1L, 2L); (k, v) <- m(id)) assert(v == 0.0, s"$id/$k")
    // a 1-token doc has no 2..10-grams and no duplicated units
    assert(m(3L).forall { case (k, v) =>
      if (k == "top_2gram_char_frac" || k.startsWith("dup_")) v == 0.0
      else true
    })
  }

  test("signals match a driver-side reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (1L to 40L).map { i =>
      val nLines = rnd.nextInt(5)
      val mk = () => Seq.fill(2 + rnd.nextInt(9))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      i -> Seq.fill(nLines)(mk()).mkString(
        if (rnd.nextBoolean()) "\n" else "\n\n")
    }
    val topNs = Seq(2, 3); val dupNs = Seq(2, 5)
    val got = sig(docs, topNs, dupNs)

    def ref(text: String): Map[String, Double] = {
      def fr(units: Seq[String]): (Double, Double) = {
        val g = units.groupBy(identity).values.map(_.size).toSeq
        val cg = units.groupBy(identity).map { case (u, o) => (o.size, u.length) }.toSeq
        val (du, au) = (g.map(_ - 1).sum.toDouble, g.sum.toDouble)
        val (dc, ac) = (cg.map { case (c, l) => (c - 1).toLong * l }.sum.toDouble,
          cg.map { case (c, l) => c.toLong * l }.sum.toDouble)
        (if (au > 0) du / au else 0.0, if (ac > 0) dc / ac else 0.0)
      }
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val paras = text.split("\n{2,}").map(_.trim).filter(_.nonEmpty).toSeq
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val tokchars = toks.map(_.length).sum.toDouble
      def grams(n: Int) = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      val top = topNs.map { n =>
        val c = grams(n).groupBy(identity).map { case (g, o) => (o.size, g.length - (n - 1), g) }
        s"top_${n}gram_char_frac" -> (if (c.isEmpty || tokchars == 0) 0.0
          else { val m = c.toSeq.sortBy(t => (t._1, t._2, t._3)).last
                 m._1.toLong * m._2 / tokchars })
      }
      val dup = dupNs.map { n =>
        val gs = grams(n).zipWithIndex
        val dupSet = gs.groupBy(_._1).filter(_._2.size > 1).keySet
        val cov = gs.filter(g => dupSet(g._1))
          .flatMap { case (_, i) => i until i + n }.distinct
        s"dup_${n}gram_char_frac" -> (if (tokchars == 0) 0.0
          else cov.map(toks(_).length).sum / tokchars)
      }
      val (lf, lcf) = fr(lines); val (pf, pcf) = fr(paras)
      (Map("dup_line_frac" -> lf, "dup_line_char_frac" -> lcf,
        "dup_para_frac" -> pf, "dup_para_char_frac" -> pcf)
        ++ top ++ dup)
    }
    docs.foreach { case (i, text) =>
      val want = ref(text)
      want.foreach { case (k, v) =>
        assert(got(i)(k) == v, s"doc $i signal $k: got ${got(i)(k)} want $v")
      }
    }
  }

  test("partitioning invariance") {
    val docs = (1L to 20L).map(i =>
      i -> s"x y x y z$i\nx y x y z$i\nw$i").toDF("doc_id", "text")
    val a = Repetition.signals(docs.repartition(1), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Repetition.signals(docs.repartition(13), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("keep applies the Gopher bounds as a conjunction") {
    val docs = Seq(
      (1L, Seq.fill(20)("the quick brown fox jumps").mkString("\n")), // dup lines
      (2L, (1 to 40).map(i => s"alpha$i beta$i gamma$i delta$i").mkString("\n")))
      .toDF("doc_id", "text")
    val out = Repetition.signals(docs, "doc_id", "text")
      .withColumn("keep", Repetition.keep())
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!out(1L), "fully duplicated doc must fail")
    assert(out(2L), "unique prose must pass")
  }

  test("guards reject invalid n-gram size lists") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Repetition.signals(df, "doc_id", "text", topNs = Seq(0))
    }
    intercept[IllegalArgumentException] {
      Repetition.signals(df, "doc_id", "text", dupNs = Seq(5, 5))
    }
  }
}
