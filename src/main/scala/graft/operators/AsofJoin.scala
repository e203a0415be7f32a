package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — for each left row, the latest right row with
  * `rightTs <= leftTs` in the same key group. Spark has no native operator
  * for this (DuckDB/kdb/pandas do), and the naive formulations fall over at
  * scale: a range self-join explodes, a correlated max-subquery re-scans.
  *
  * This is the UNION-AND-SWEEP form — the scalable composition (SURVEY.md
  * §7.3 preference (a)): tag both inputs, union them, and run ONE window
  * sweep per key ordered by (ts, side) where right rows sort before left
  * rows at equal timestamps (as-of is inclusive). `last(value,
  * ignoreNulls=true)` over the unbounded-preceding frame is evaluated
  * incrementally by Spark's running window frame — O(1) per row, never
  * re-scanning the prefix. Total cost: one shuffle on the key + one sort,
  * identical to a sort-merge join — no range blow-up at any scale.
  */
object AsofJoin {

  /** Backward as-of join (the standard direction).
    *
    * @param valueCols map of right-side column → output name (right columns
    *   may shadow left names — outputs are renamed, so no collision)
    * @note right side should be unique per (by, rightTs); with duplicates the
    *   surviving row follows sort-tie order (same caveat as DuckDB ASOF). */
  def backward(left: DataFrame, right: DataFrame, by: String,
               leftTs: String, rightTs: String,
               valueCols: Map[String, String]): DataFrame = {
    val vals = valueCols.toSeq
    val leftPayload = left.columns.toSeq.filterNot(_ == by)
    // common schema: by, __ats (event time), __side (0=right, 1=left),
    // left payload (null on right rows), values (null on left rows)
    val l2 = left.select(
      (col(by) +: col(leftTs).as("__ats") +: lit(1).as("__side") +:
        leftPayload.map(c => col(c).as(s"__l_$c"))) ++
        vals.map { case (rc, out) =>
          lit(null).cast(right.schema(rc).dataType).as(s"__v_$out") }: _*)
    val r2 = right.select(
      (col(by) +: col(rightTs).as("__ats") +: lit(0).as("__side") +:
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))) ++
        vals.map { case (rc, out) => col(rc).as(s"__v_$out") }: _*)
    val w = Window.partitionBy(by)
      .orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = vals.foldLeft(l2.unionByName(r2)) { case (df, (_, out)) =>
      df.withColumn(out, last(col(s"__v_$out"), ignoreNulls = true).over(w))
    }
    swept.where(col("__side") === 1)
      .select(col(by) +: leftPayload.map(c => col(s"__l_$c").as(c)) ++:
        vals.map { case (_, out) => col(out) }: _*)
  }
}
