package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join — point-in-interval joins that survive scale.
  *
  * Catalyst plans a bare `p BETWEEN lo AND hi` join as a broadcast nested
  * loop (or cartesian product): every point against every interval. The
  * standard fix (cf. Databricks' range-join binning) is to EQUI-BIN: explode
  * each interval into the fixed-width bins it overlaps, map each point to
  * its single bin, equi-join on the bin id, and re-check the exact predicate.
  * The nested loop becomes one shuffle keyed on the bin — at 100 TB this is
  * the difference between O(n·m) and O(n + m + output).
  *
  * `binWidth` trades duplication for selectivity: intervals explode into
  * `span/binWidth + 1` rows, bins collect `binWidth`-proportional candidate
  * sets. Rule of thumb: binWidth ≈ the typical interval span (each interval
  * then covers ≤ 2 bins).
  *
  * When the point column is LOW-CARDINALITY relative to row count (dates,
  * bucketed prices), pre-aggregate points by value and carry the count as a
  * weight: `points.groupBy(p).count()` → join → `SUM(weight)`. The join then
  * scales with distinct values × intervals, not rows × intervals — at sf0.1
  * this turns a 57M-row join into a few-hundred-k one (see the x08 query).
  */
object RangeJoin {

  /** Floor-division kept entirely in LONG arithmetic. `floor(col / w)` would
    * divide in double precision, and beyond 2^53 (epoch-nanosecond
    * timestamps) a boundary point can land in the wrong bin — and since the
    * exact BETWEEN re-check runs AFTER the equi-join, the true match would be
    * silently dropped. Subtracting `pmod` first makes the dividend an exact
    * multiple of `w`, so integral division (`div`, truncating) equals floor
    * for negative values too. */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) = {
    val cl = c.cast("long")
    call_function("div", cl - pmod(cl, lit(w)), lit(w))
  }

  /** Join `points` (numeric column `pointCol`) to `intervals` rows whose
    * `[loCol, hiCol]` (inclusive both ends) contains the point. Output:
    * point columns ++ interval columns; column names must be disjoint. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p2 = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val i2 = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col(loCol), binWidth), floorDiv(col(hiCol), binWidth))))
    p2.join(i2, "__bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-OVERLAP join: pairs of `[aLo, aHi]` × `[bLo, bHi]` intervals
    * (inclusive ends) that intersect. Both sides explode into their bins and
    * equi-join on the bin id; a pair spanning several common bins would match
    * once per bin, so each pair is emitted ONLY at its first shared bin —
    * `bin == max(floor(aLo/w), floor(bLo/w))` (bin OWNERSHIP, the standard
    * dedup-free trick: no distinct shuffle over the joined output). Column
    * names must be disjoint across the two inputs. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val a2 = a.withColumn("__bin",
      explode(sequence(floorDiv(col(aLo), binWidth), floorDiv(col(aHi), binWidth))))
    val b2 = b.withColumn("__bin",
      explode(sequence(floorDiv(col(bLo), binWidth), floorDiv(col(bHi), binWidth))))
    a2.join(b2, "__bin")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col("__bin") ===
        greatest(floorDiv(col(aLo), binWidth), floorDiv(col(bLo), binWidth)))
      .drop("__bin")
  }
}
