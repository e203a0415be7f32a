package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SpanCorruption

/** Pins for the T5-style span-corruption builder: bit-exact parity with a
  * driver-side reference walk, the splice-back roundtrip invariant, mask
  * fraction, determinism/partitioning invariance, and edge cases. */
class SpanCorruptionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver reference: the same sha-keyed walk. */
  private def reference(id: Long, text: String, salt: String,
                        startMod: Int, maxSpanLen: Int): (String, String, Int) = {
    import java.security.MessageDigest
    def h(tag: String, pos: Int): Long = {
      val hex = MessageDigest.getInstance("SHA-256")
        .digest(s"$id:$salt:$tag:$pos".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val inp = scala.collection.mutable.ArrayBuffer.empty[String]
    val tgt = scala.collection.mutable.ArrayBuffer.empty[String]
    // rem > 0: in span; rem == -1: cooldown token (kept, cannot start)
    var rem = 0; var k = 0
    toks.zipWithIndex.foreach { case (w, i) =>
      if (rem > 0) { tgt += w; rem -= 1; if (rem == 0) rem = -1 }
      else if (rem == -1) { inp += w; rem = 0 }
      else if (h("s", i) % startMod == 0) {
        val len = (h("l", i) % maxSpanLen).toInt + 1
        val sentinel = s"<extra_id_$k>"
        inp += sentinel; tgt += sentinel; tgt += w
        rem = if (len == 1) -1 else len - 1; k += 1
      } else inp += w
    }
    (inp.mkString(" "), tgt.mkString(" "), k)
  }

  private def fixture(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val words = Seq("ein", "zwei", "drei", "vier", "funf", "sechs")
    (1L to n.toLong).map { i =>
      (i, (1 to rnd.nextInt(40) + 5).map(_ => words(rnd.nextInt(6))).mkString(" "))
    }
  }

  test("matches the driver-side reference walk bit-exactly") {
    val rows = fixture(80, 3)
    val df = rows.toDF("doc_id", "text").repartition(5)
    val got = SpanCorruption.corrupt(df, "doc_id", "text", "s1")
      .as[(Long, String, String, Int)].collect().sortBy(_._1).toSeq
    val want = rows.map { case (id, t) =>
      val (i, g, k) = reference(id, t, "s1", 6, 3); (id, i, g, k)
    }
    assert(got == want)
    assert(got.exists(_._4 > 0), "fixture must actually mask something")
  }

  test("sentinels always alternate with kept text (no adjacent sentinels)") {
    val rows = fixture(150, 17)
    val df = rows.toDF("doc_id", "text")
    val got = SpanCorruption.corrupt(df, "doc_id", "text", "alt")
      .as[(Long, String, String, Int)].collect()
    assert(got.map(_._4).sum > 50, "fixture must mask enough to be meaningful")
    got.foreach { case (id, inp, _, _) =>
      val toks = inp.split(" ").filter(_.nonEmpty)
      toks.sliding(2).foreach { pair =>
        assert(!(pair.length == 2 && pair.forall(_.startsWith("<extra_id_"))),
          s"adjacent sentinels in doc $id: ${pair.mkString(" ")}")
      }
    }
  }

  test("splice-back roundtrip reproduces the original token stream") {
    val rows = fixture(60, 9)
    val df = rows.toDF("doc_id", "text")
    val got = SpanCorruption.corrupt(df, "doc_id", "text", "s2")
      .as[(Long, String, String, Int)].collect()
    val byId = rows.toMap
    got.foreach { case (id, inp, tgt, k) =>
      // parse target into sentinel → span map
      val spans = scala.collection.mutable.Map.empty[String, List[String]]
      var cur: String = null
      tgt.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Nil }
        else spans(cur) = spans(cur) :+ t
      }
      assert(spans.size == k)
      val rebuilt = inp.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else Seq(t)
      }
      val orig = byId(id).split("\\s+").filter(_.nonEmpty).toSeq
      assert(rebuilt.toSeq == orig, s"roundtrip failed for doc $id")
    }
  }

  test("mask fraction lands near the configured rate; salt changes the masks") {
    val rows = fixture(200, 21)
    val df = rows.toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(df, "doc_id", "text", "sA")
      .as[(Long, String, String, Int)].collect()
    val totalToks = rows.map(_._2.split("\\s+").count(_.nonEmpty)).sum.toDouble
    val masked = out.map(r =>
      r._3.split(" ").count(t => t.nonEmpty && !t.startsWith("<extra_id_"))).sum
    val frac = masked / totalToks
    // startMod=6, spans 1..3 → expected ≈ 2/6 / (1 + smallcorr) ∈ (0.2, 0.45)
    assert(frac > 0.15 && frac < 0.5, s"mask fraction $frac")
    val other = SpanCorruption.corrupt(df, "doc_id", "text", "sB")
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    assert(other.map(_._2).toSeq != out.sortBy(_._1).map(_._2).toSeq,
      "a different salt must mask differently")
    // partitioning invariance
    val one = SpanCorruption.corrupt(df.coalesce(1), "doc_id", "text", "sA")
      .as[(Long, String, String, Int)].collect().sortBy(_._1).toSeq
    assert(one == out.sortBy(_._1).toSeq)
  }

  test("edge cases: empty docs yield empty pair; guards throw") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "solo")).toDF("doc_id", "text")
    val got = SpanCorruption.corrupt(df, "doc_id", "text")
      .as[(Long, String, String, Int)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "", "", 0)) && got(1) == ((2L, "", "", 0)))
    intercept[IllegalArgumentException](
      SpanCorruption.corrupt(df, "doc_id", "text", startMod = 1))
    intercept[IllegalArgumentException](
      SpanCorruption.corrupt(df, "doc_id", "text", maxSpanLen = 0))
  }
}
