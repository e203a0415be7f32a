package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultipleTesting

class MultipleTestingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def thr(ps: Seq[Double], alpha: Double)
      : (Long, Option[Double], Long) = {
    val r = MultipleTesting.bhThreshold(ps.toDF("p"), "p", alpha)
      .collect().head
    (r.getAs[Long]("m"),
      if (r.isNullAt(r.fieldIndex("threshold"))) None
      else Some(r.getAs[Double]("threshold")),
      r.getAs[Long]("n_rejected"))
  }

  test("textbook case: cutoffs k·α/m, three rejections") {
    // p·m ≤ k·α at α=0.1, m=5: .01·5=.05 ≤ .1 ✓, .02·5=.1 ≤ .2 ✓,
    // .03·5=.15 ≤ .3 ✓, .5·5 > .4 ✗, .6·5 > .5 ✗
    assert(thr(Seq(0.01, 0.02, 0.03, 0.5, 0.6), 0.1)
      == (5L, Some(0.03), 3L))
  }

  test("step-up: a later rank rescues an earlier failure") {
    // m=2, α=0.045: p(1)=.03 > .0225 alone, but p(2)=.04 ≤ .045
    // → threshold .04 rejects BOTH (step-up, not step-down)
    assert(thr(Seq(0.03, 0.04), 0.045) == (2L, Some(0.04), 2L))
  }

  test("tied p-values use their largest rank") {
    // p = [.15, .15], m=2, α=0.2: p·m = .3; rank 2 gives .4 ≥ .3 ✓
    // (rank 1 would give .2 < .3 and wrongly reject nothing)
    assert(thr(Seq(0.15, 0.15), 0.2) == (2L, Some(0.15), 2L))
  }

  test("nothing qualifies: NULL threshold, zero rejected, all flags false") {
    assert(thr(Seq(0.5, 0.9), 0.05) == (2L, None, 0L))
    val flags = MultipleTesting.benjaminiHochberg(
        Seq(0.5, 0.9).toDF("p"), "p", 0.05)
      .collect().map(_.getAs[Boolean]("bh_keep"))
    assert(flags.forall(!_))
  }

  test("flags agree with the threshold and keep original columns") {
    val df = Seq((1, 0.01), (2, 0.02), (3, 0.03), (4, 0.5), (5, 0.6))
      .toDF("id", "p")
    val got = MultipleTesting.benjaminiHochberg(df, "p", 0.1)
      .orderBy("id").collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[Boolean]("bh_keep"))
    assert(got.toSeq == Seq(1 -> true, 2 -> true, 3 -> true,
      4 -> false, 5 -> false))
  }

  test("p outside [0,1] or NULL fails loudly") {
    val e = intercept[Exception] {
      MultipleTesting.bhThreshold(Seq(0.5, 1.5).toDF("p"), "p", 0.1)
        .collect()
    }
    assert(e.getMessage.contains("p-value"))
    val e2 = intercept[Exception] {
      MultipleTesting.benjaminiHochberg(
        Seq(Some(0.5), None).toDF("p"), "p", 0.1).collect()
    }
    assert(e2.getMessage.contains("p-value"))
  }

  test("alpha out of range is rejected eagerly") {
    intercept[IllegalArgumentException] {
      MultipleTesting.bhThreshold(Seq(0.5).toDF("p"), "p", 1.0)
    }
  }
}
