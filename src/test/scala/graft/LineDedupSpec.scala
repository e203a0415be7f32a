package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LineDedup

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minDf: Int, parts: Int = 4) =
    LineDedup.removeBoilerplateLines(
        docs.toDF("doc_id", "text").repartition(parts),
        "doc_id", "text", minDocFreq = minDf)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("a line in >= minDocFreq docs is removed from EVERY doc, order kept") {
    val out = run(Seq(
      (1L, "alpha\nSUBSCRIBE NOW\nbeta"),
      (2L, "gamma\nSUBSCRIBE NOW"),
      (3L, "SUBSCRIBE NOW")), minDf = 2)
    assert(out.toSeq == Seq(
      (1L, "alpha\nbeta", 3L, 1L),
      (2L, "gamma", 2L, 1L),
      (3L, "", 1L, 1L))) // fully-boilerplate doc kept as an empty row
  }

  test("below the threshold nothing is removed — byte-exact identity") {
    val docs = Seq((1L, "alpha\nSUB\nbeta"), (2L, "gamma\nSUB"))
    val out = run(docs, minDf = 3)
    assert(out.map(r => (r._1, r._2)).toSeq == docs)
    assert(out.forall(_._4 == 0L))
  }

  test("within-doc repeats only count once toward document frequency") {
    // "x" appears 3 times but in ONE document — df=1, not boilerplate
    val out = run(Seq((1L, "x\nx\nx"), (2L, "y")), minDf = 2)
    assert(out.toSeq == Seq((1L, "x\nx\nx", 3L, 0L), (2L, "y", 1L, 0L)))
  }

  test("empty lines are lines: shared blank lines scrub like any boilerplate") {
    val out = run(Seq((1L, "x\n\ny"), (2L, "z\n\nw")), minDf = 2)
    assert(out.toSeq == Seq((1L, "x\ny", 3L, 1L), (2L, "z\nw", 3L, 1L)))
  }

  test("output is invariant to input partitioning") {
    val docs = (1L to 40L).map(i =>
      (i, s"unique $i\nBOILER\nalso unique $i" + (if (i % 2 == 0) "\nBOILER" else "")))
    val a = run(docs, minDf = 2, parts = 1).toSeq
    val b = run(docs, minDf = 2, parts = 13).toSeq
    assert(a == b)
    assert(a.forall(!_._2.contains("BOILER")))
  }
}
