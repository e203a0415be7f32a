package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Bit-by-bit reference Morton encode. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zOrder2 equals the bit-by-bit reference on crafted and random coords") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0xFFFFFFFFL),
      (12345L, 67890L)) ++ Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("x", "y")
      .select(Layout.zOrder2(col("x"), col("y"))).as[Long].collect()
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == mortonRef(x, y), s"x=$x y=$y")
    }
  }

  test("clusterByZOrder makes BOTH dimensions file-prunable (single-sort only prunes one)") {
    // uniform 256x256 grid in 16 slices. A slice "survives" a point predicate
    // on a column if the value falls inside the slice's [min,max] for that
    // column — exactly parquet min/max file skipping. Sorting by x alone gives
    // perfect x-pruning but NO y-pruning (every strip spans all of y);
    // z-order prunes both dimensions.
    val pts = for (x <- 0 until 256; y <- 0 until 256) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    def bounds(d: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      d.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def surviving(bs: Array[(Long, Long, Long, Long)], probes: Seq[Long],
                  dim: Char): Double =
      probes.map { v =>
        bs.count { case (x0, x1, y0, y1) =>
          if (dim == 'x') x0 <= v && v <= x1 else y0 <= v && v <= y1 }
      }.sum.toDouble / probes.size
    val probes = Seq(3L, 97L, 128L, 201L, 255L)
    val xSorted = bounds(df.repartitionByRange(16, col("x"), col("y")))
    val z = Layout.clusterByZOrder(df, "x", "y", 16)
    val zb = bounds(z)
    assert(surviving(xSorted, probes, 'y') == 16.0,
      "x-sorted layout cannot prune on y — every slice survives")
    // threshold 8 (half the no-pruning baseline): ideal 4x4 blocks survive 4
    // probes/dim, but repartitionByRange's sample seed folds in the rddId, so
    // boundaries drift a little with prior session workload — 6.0 was
    // observed flaking to ~6-7 depending on which suites ran first
    assert(surviving(zb, probes, 'x') <= 8.0 && surviving(zb, probes, 'y') <= 8.0,
      s"z-order must prune both dims: x=${surviving(zb, probes, 'x')} y=${surviving(zb, probes, 'y')}")
    // and the layout is a pure reorder: same multiset of rows
    assert(z.count() == df.count())
  }

  test("zOrder2 truncates to low 32 bits and is monotone along each axis locally") {
    val r = Seq((0x1FFFFFFFFL, 2L)).toDF("x", "y")
      .select(Layout.zOrder2(col("x"), col("y"))).as[Long].head()
    assert(r == mortonRef(0xFFFFFFFFL, 2L))
    // within a fixed y, increasing x never decreases z at same bit width
    val xs = (0L to 63L).map(x => mortonRef(x, 5L))
    assert(xs == xs.sorted)
  }
}
