package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Fim

/** Pins for the FIM (fill-in-the-middle) example builder: the splice
  * roundtrip (prefix ++ middle ++ suffix ≡ original tokens), the PSM
  * serialization, split-point parity with a driver-side replay of the hash
  * arithmetic, rate gating, determinism, and edge cases. */
class FimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      val len = rnd.nextInt(12)
      (i.toLong, (0 until len).map(j => s"w${rnd.nextInt(20)}_$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Driver replay of the operator's sha256-prefix arithmetic. */
  private def h32(id: Long, salt: String, tag: String): Long = {
    val hex = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$id:$salt:$tag".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("roundtrip: prefix ++ middle ++ suffix re-concatenates to the original tokens") {
    val out = Fim.fimExamples(corpus(200), "doc_id", "text", fimFraction = 1.0)
      .select(col("doc_id"), col("prefix"), col("middle"), col("suffix"),
        col("n_tokens"))
      .collect()
    val orig = corpus(200).collect().map(r => r.getLong(0) ->
      r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq).toMap
    assert(out.length == 200)
    out.foreach { r =>
      val joined = Seq(r.getString(1), r.getString(2), r.getString(3))
        .flatMap(_.split("\\s+").filter(_.nonEmpty))
      assert(joined == orig(r.getLong(0)),
        s"roundtrip failed for doc ${r.getLong(0)}")
      assert(joined.length == r.getLong(4))
    }
  }

  test("split points match the driver replay of the hash arithmetic") {
    val out = Fim.fimExamples(corpus(100), "doc_id", "text", fimFraction = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getString(4))).toMap
    corpus(100).collect().foreach { r =>
      val (id, toks) = (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty))
      val n = toks.length
      val a = (h32(id, "fim", "a") % (n + 1)).toInt
      val b = a + (h32(id, "fim", "b") % (n - a + 1)).toInt
      val (p, m, s) = out(id)
      assert(p == toks.take(a).mkString(" "), s"prefix doc $id")
      assert(m == toks.slice(a, b).mkString(" "), s"middle doc $id")
      assert(s == toks.drop(b).mkString(" "), s"suffix doc $id")
    }
  }

  test("PSM serialization carries the three markers in order; plain rows keep the original text") {
    val out = Fim.fimExamples(corpus(200), "doc_id", "text", fimFraction = 0.5)
      .collect()
    val fimRows = out.filter(_.getBoolean(1))
    // hash gating at 0.5 must actually split the corpus
    assert(fimRows.nonEmpty && fimRows.length < out.length)
    fimRows.foreach { r =>
      val t = r.getString(5)
      val (ip, is, im) = (t.indexOf("<fim_pre>"), t.indexOf("<fim_suf>"),
        t.indexOf("<fim_mid>"))
      assert(ip == 0 && is > ip && im > is, s"marker order violated: $t")
    }
    val orig = corpus(200).collect().map(r => r.getLong(0) ->
      r.getString(1).split("\\s+").filter(_.nonEmpty).mkString(" ")).toMap
    out.filterNot(_.getBoolean(1)).foreach { r =>
      assert(r.getString(5) == orig(r.getLong(0)))
      assert(r.getString(2) == "" && r.getString(3) == "" && r.getString(4) == "")
    }
  }

  test("fimFraction 0 and 1 are total; gating is content-keyed (salt-stable)") {
    val none = Fim.fimExamples(corpus(50), "doc_id", "text", fimFraction = 0.0)
    assert(none.where(col("is_fim")).count() == 0)
    val all = Fim.fimExamples(corpus(50), "doc_id", "text", fimFraction = 1.0)
    assert(all.where(!col("is_fim")).count() == 0)
    val a = Fim.fimExamples(corpus(50), "doc_id", "text", fimFraction = 0.5)
      .where(col("is_fim")).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Fim.fimExamples(corpus(50).repartition(7), "doc_id", "text",
      fimFraction = 0.5)
      .where(col("is_fim")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "gating must be partitioning-invariant")
    val salted = Fim.fimExamples(corpus(50), "doc_id", "text", salt = "ep1",
      fimFraction = 0.5)
      .where(col("is_fim")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != salted, "different salt must select a different subset")
  }

  test("empty documents and guards") {
    val out = Fim.fimExamples(Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", fimFraction = 1.0).collect()
    out.foreach { r =>
      assert(r.getBoolean(1) && r.getString(2) == "" && r.getString(3) == "" &&
        r.getString(4) == "" && r.getLong(6) == 0L)
    }
    intercept[IllegalArgumentException] {
      Fim.fimExamples(corpus(1), "doc_id", "text", fimFraction = 1.5)
    }
  }
}
