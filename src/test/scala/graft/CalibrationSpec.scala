package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Calibration

/** Pins for the calibration diagnostics: hand-computed bins/ECE/MCE/Brier,
  * boundary binning, the fused one-pass guard, and parameter guards. */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reliability bins and summary match hand computation") {
    // bin 2 (p in [0.2,0.3)): 4 rows at 0.25, 1 positive  -> acc 0.25, gap 0
    // bin 8 (p in [0.8,0.9)): 2 rows at 0.85, 1 positive  -> acc 0.5, gap 0.35
    val df = (Seq.fill(3)((0.25, 0.0)) ++ Seq((0.25, 1.0)) ++
      Seq((0.85, 1.0), (0.85, 0.0))).toDF("p", "y")
    val bins = Calibration.reliabilityBins(df, "p", "y")
      .orderBy("bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(2, 8))
    val b2 = bins(0); val b8 = bins(1)
    assert(b2.getLong(1) == 4 && math.abs(b2.getDouble(2) - 0.25) < 1e-12 &&
      math.abs(b2.getDouble(3) - 0.25) < 1e-12 &&
      math.abs(b2.getDouble(4)) < 1e-12)
    assert(b8.getLong(1) == 2 && math.abs(b8.getDouble(4) - 0.35) < 1e-12)
    val s = Calibration.summary(df, "p", "y").head()
    assert(s.getLong(0) == 6)
    // ece = (4*0 + 2*0.35)/6; mce = 0.35
    assert(math.abs(s.getDouble(1) - 0.7 / 6) < 1e-12)
    assert(math.abs(s.getDouble(2) - 0.35) < 1e-12)
    // brier = (3*0.25^2 + 0.75^2 + 0.15^2 + 0.85^2) / 6
    val brier = (3 * 0.0625 + 0.5625 + 0.0225 + 0.7225) / 6
    assert(math.abs(s.getDouble(3) - brier) < 1e-12)
  }

  test("p = 1.0 lands in the last bin, p = 0.0 in the first") {
    val bins = Calibration.reliabilityBins(
      Seq((1.0, 1.0), (0.0, 0.0)).toDF("p", "y"), "p", "y", nBins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(0, 9))
  }

  test("perfectly calibrated input has zero ECE") {
    val df = (Seq.fill(9)((0.1, 0.0)) :+ ((0.1, 1.0))).toDF("p", "y")
    val s = Calibration.summary(df, "p", "y").head()
    assert(math.abs(s.getDouble(1)) < 1e-12 && math.abs(s.getDouble(2)) < 1e-12)
  }

  test("isotonicCalibrate pools adjacent violators to the weighted mean") {
    // bins: 1 -> acc 1.0 (2 rows), 2 -> acc 0.0 (2 rows): violator pair
    // pools to (2 pos)/(4 n) = 0.5; bin 8 -> acc 1.0 stays above
    val df = (Seq.fill(2)((0.15, 1.0)) ++ Seq.fill(2)((0.25, 0.0)) ++
      Seq((0.85, 1.0))).toDF("p", "y")
    val out = Calibration.isotonicCalibrate(df, "p", "y")
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 8))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.5, 0.5, 1.0))
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 0.0, 1.0))
  }

  test("isotonicCalibrate invariants: monotone fit, positive count preserved") {
    // pseudo-random accs with planted non-monotonicity
    val rows = (0 until 200).map { i =>
      (((i * 19) % 101) / 100.0, if ((i * 23) % 101 < (i * 19) % 101) 1.0 else 0.0)
    }
    val out = Calibration.isotonicCalibrate(rows.toDF("p", "y"), "p", "y")
      .orderBy("bin").collect()
    val fit = out.map(_.getDouble(3)).toSeq
    assert(fit == fit.sorted, s"fit must be non-decreasing: $fit")
    val totalFit = out.map(r => r.getLong(1) * r.getDouble(3)).sum
    val totalPos = rows.count(_._2 == 1.0).toDouble
    assert(math.abs(totalFit - totalPos) < 1e-9,
      "PAV preserves the corpus positive count")
    // an already-monotone diagram passes through unchanged
    val mono = Seq((0.05, 0.0), (0.55, 1.0), (0.95, 1.0)).toDF("p", "y")
    val m = Calibration.isotonicCalibrate(mono, "p", "y").orderBy("bin")
      .collect()
    assert(m.forall(r => r.getDouble(2) == r.getDouble(3)))
  }

  test("out-of-range probabilities and non-binary labels fail the scan loudly") {
    def run(p: Double, y: Double): Unit =
      Calibration.summary(Seq((p, y)).toDF("p", "y"), "p", "y").collect()
    intercept[Exception] { run(1.5, 1.0) }
    intercept[Exception] { run(-0.1, 0.0) }
    intercept[Exception] { run(0.5, 2.0) }
    intercept[IllegalArgumentException] {
      Calibration.reliabilityBins(Seq((0.5, 1.0)).toDF("p", "y"), "p", "y",
        nBins = 1)
    }
  }
}
