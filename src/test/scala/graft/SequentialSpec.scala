package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sequential

class SequentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side reference: cumulative moments per look, Welch-style V,
    * mixture-SPRT log Λ, running-min p. */
  private def reference(rows: Seq[(String, Long, Double)], tau2: Double)
      : Seq[(Long, Option[Double], Option[Double])] = {
    val looks = rows.map(_._2).distinct.sorted
    var maxLl = Option.empty[Double]
    looks.map { o =>
      val pre = rows.filter(_._2 <= o)
      val a = pre.filter(_._1 == "A").map(_._3)
      val b = pre.filter(_._1 == "B").map(_._3)
      val ll =
        if (a.size < 2 || b.size < 2) None
        else {
          def m(xs: Seq[Double]) = xs.sum / xs.size
          def ev(xs: Seq[Double]) = {
            val mu = m(xs)
            xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1) / xs.size
          }
          val v = ev(a) + ev(b)
          if (v <= 0.0) None
          else {
            val d = m(a) - m(b)
            Some(0.5 * math.log(v / (v + tau2))
              + d * d * tau2 / (2.0 * v * (v + tau2)))
          }
        }
      ll.foreach(l => maxLl = Some(maxLl.fold(l)(math.max(_, l))))
      (o, ll, maxLl.map(m => math.min(1.0, math.exp(-m))))
    }
  }

  test("matches the driver-side mSPRT reference look by look") {
    val rows = Seq(
      ("A", 0L, 1.0), ("A", 0L, 3.0), ("B", 0L, 2.0), ("B", 0L, 6.0),
      ("A", 1L, 11.0), ("A", 1L, 13.0), ("B", 1L, 2.0), ("B", 1L, 2.0),
      ("A", 2L, 12.0), ("B", 2L, 3.0))
    val got = Sequential.alwaysValidMeanTest(
        rows.toDF("g", "o", "v").repartition(5), "g", "v", "o", "A", "B",
        tau2 = 5.0)
      .orderBy("ord").collect()
    val want = reference(rows, 5.0)
    assert(got.length == want.length)
    got.zip(want).foreach { case (r, (o, ll, p)) =>
      assert(r.getAs[Long]("ord") == o)
      (Option(r.getAs[java.lang.Double]("log_lambda")), ll) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"ll@$o")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"ll@$o: $a vs $b")
      }
      (Option(r.getAs[java.lang.Double]("p_value")), p) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"p@$o")
        case (a, b) => assert(a.isEmpty == b.isEmpty, s"p@$o")
      }
    }
  }

  test("p is monotone non-increasing and capped at 1") {
    val rows = (0L until 20L).flatMap { o =>
      (1 to 5).flatMap { i =>
        Seq(("A", o, (o * 3 + i).toDouble), ("B", o, (i * 2).toDouble))
      }
    }
    val p = Sequential.alwaysValidMeanTest(
        rows.toDF("g", "o", "v"), "g", "v", "o", "A", "B", tau2 = 4.0)
      .orderBy("ord").collect()
      .flatMap(r => Option(r.getAs[java.lang.Double]("p_value")))
      .map(_.doubleValue)
    assert(p.nonEmpty && p.forall(x => x <= 1.0 && x >= 0.0))
    p.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-15) }
    // a sustained real effect must eventually drive p well below 1
    assert(p.last < 0.05, s"sustained effect not detected: p=${p.last}")
  }

  test("looks before both sides reach n >= 2 carry NULL statistics") {
    val rows = Seq(("A", 0L, 1.0), ("B", 0L, 2.0), // n=1 each: no variance
      ("A", 1L, 3.0), ("B", 1L, 4.0))
    val got = Sequential.alwaysValidMeanTest(
        rows.toDF("g", "o", "v"), "g", "v", "o", "A", "B", tau2 = 1.0)
      .orderBy("ord").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("log_lambda")))
    assert(got(0).isNullAt(got(0).fieldIndex("p_value")))
    assert(!got(1).isNullAt(got(1).fieldIndex("log_lambda")))
  }

  test("all-tied prefixes (zero variance) stay NULL; guards fire loudly") {
    val rows = Seq(("A", 0L, 5.0), ("A", 0L, 5.0), ("B", 0L, 5.0),
      ("B", 0L, 5.0))
    val got = Sequential.alwaysValidMeanTest(
        rows.toDF("g", "o", "v"), "g", "v", "o", "A", "B", tau2 = 1.0)
      .collect()
    assert(got(0).isNullAt(got(0).fieldIndex("log_lambda")))
    intercept[IllegalArgumentException] {
      Sequential.alwaysValidMeanTest(rows.toDF("g", "o", "v"),
        "g", "v", "o", "A", "A", tau2 = 1.0)
    }
    intercept[IllegalArgumentException] {
      Sequential.alwaysValidMeanTest(rows.toDF("g", "o", "v"),
        "g", "v", "o", "A", "B", tau2 = 0.0)
    }
    val e = intercept[Exception] {
      Sequential.alwaysValidMeanTest(
        Seq(("A", Some(0L), 1.0), ("B", None, 2.0))
          .toDF("g", "o", "v"), "g", "v", "o", "A", "B", tau2 = 1.0)
        .collect()
    }
    assert(e.getMessage.contains("NULL"))
  }
}
