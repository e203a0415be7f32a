package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QuantileNormalize

class QuantileNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(rows: Seq[(String, Double)]): Map[(String, Double), Double] =
    QuantileNormalize.toPooled(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Double]("v"))
        -> r.getAs[Double]("normalized"))
      .toMap

  test("equal-size groups land on the IDENTICAL pooled support") {
    // A = [2,4,6], B = [10,20,30]: pooled [2,4,6,10,20,30], both groups
    // map rank 1,2,3 → k = 1,3,5 → values 2, 6, 20
    val m = norm(Seq("A" -> 2.0, "A" -> 4.0, "A" -> 6.0,
      "B" -> 30.0, "B" -> 10.0, "B" -> 20.0))
    assert(m(("A", 2.0)) == 2.0 && m(("A", 4.0)) == 6.0
      && m(("A", 6.0)) == 20.0)
    assert(m(("B", 10.0)) == 2.0 && m(("B", 20.0)) == 6.0
      && m(("B", 30.0)) == 20.0)
  }

  test("ties stay tied and the hand rank arithmetic holds") {
    // A = [5,5,9], B = [1,2,3]; pooled distinct (v, cum):
    // (1,1)(2,2)(3,3)(5,5)(9,6), N = 6
    // A tie block 5: 2r = 3+… → r2 = 3, k = ⌈2·6/6⌉ = 2 → 2
    // A 9: r2 = 6, k = ⌈5·6/6⌉ = 5 → 5;  B: k = 1,3,5 → 1, 3, 5
    val m = norm(Seq("A" -> 5.0, "A" -> 5.0, "A" -> 9.0,
      "B" -> 1.0, "B" -> 2.0, "B" -> 3.0))
    assert(m(("A", 5.0)) == 2.0)
    assert(m(("A", 9.0)) == 5.0)
    assert(m(("B", 1.0)) == 1.0 && m(("B", 2.0)) == 3.0
      && m(("B", 3.0)) == 5.0)
  }

  test("within-group order is exactly preserved") {
    val rows = (1 to 40).map(i => ("A", ((i * 7) % 13).toDouble)) ++
      (1 to 25).map(i => ("B", ((i * 11) % 17 * 100).toDouble))
    val out = QuantileNormalize.toPooled(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for (g <- Seq("A", "B")) {
      val byV = out.filter(_._1 == g).sortBy(_._2)
      val ns = byV.map(_._3)
      assert(ns.zip(ns.tail).forall { case (a, b) => a <= b },
        s"monotone in $g: ${ns.toSeq}")
    }
  }

  test("normalized values are pooled DATA values") {
    val rows = Seq("A" -> 3.5, "A" -> 7.25, "B" -> 1.125, "B" -> 9.75)
    val pooledVals = rows.map(_._2).toSet
    assert(norm(rows).values.forall(pooledVals.contains))
  }

  test("singleton group maps to the pooled lower median") {
    // pooled = [1,2,3,4,5] (N=5); singleton: k = ⌈5/2⌉ = 3 → 3
    val m = norm(Seq("B" -> 1.0, "B" -> 2.0, "B" -> 4.0, "B" -> 5.0,
      "A" -> 3.0))
    assert(m(("A", 3.0)) == 3.0)
  }

  test("reproducible across partitionings") {
    val rows = (1 to 60).map(i => (s"g${i % 3}", ((i * 13) % 23).toDouble))
    val df1 = rows.toDF("g", "v")
    val df8 = rows.toDF("g", "v").repartition(8)
    val a = QuantileNormalize.toPooled(df1, "g", "v")
      .orderBy("g", "v").collect().map(_.getDouble(2)).toSeq
    val b = QuantileNormalize.toPooled(df8, "g", "v")
      .orderBy("g", "v").collect().map(_.getDouble(2)).toSeq
    assert(a == b)
  }

  test("NULL group or value fails loudly") {
    val bad = Seq((Some("A"), Some(1.0)), (None, Some(2.0)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      QuantileNormalize.toPooled(bad, "g", "v").collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
