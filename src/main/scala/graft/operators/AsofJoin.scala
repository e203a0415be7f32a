package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join — for each left row, the latest right row with
  * `rightTs <= leftTs` in the same key group. Spark has no native operator
  * for this (DuckDB/kdb/pandas do), and the naive formulations fall over at
  * scale: a range self-join explodes, a correlated max-subquery re-scans.
  *
  * This is the UNION-AND-SWEEP form — the scalable composition (SURVEY.md
  * §7.3 preference (a)): tag both inputs, union them, and run ONE window
  * sweep per key ordered by (ts, side) where right rows sort before left
  * rows at equal timestamps (as-of is inclusive). The sweep carries a single
  * STRUCT of all right value columns — `last(struct, ignoreNulls=true)` over
  * the unbounded-preceding running frame is evaluated incrementally by
  * Spark's window — O(1) per row, never re-scanning the prefix. Total cost:
  * one shuffle on the key + one sort, identical to a sort-merge join — no
  * range blow-up at any scale.
  *
  * Matching ONE struct per left row (not one `last` per value column) gives
  * SQL ASOF semantics for nullable right values: the matched row is chosen
  * once by timestamp, and its values — NULLs included — propagate together.
  * Per-column `last(ignoreNulls)` would instead skip a NULL value and leak
  * an older row's value, mixing columns across right rows.
  */
object AsofJoin {

  /** Backward as-of join (the standard direction).
    *
    * @param valueCols map of right-side column → output name (right columns
    *   may shadow left names — outputs are renamed, so no collision)
    * @param joinType `"left"` (default — every left row survives, unmatched
    *   rows carry NULL outputs, DuckDB `ASOF LEFT JOIN`) or `"inner"`
    *   (unmatched left rows are DROPPED, DuckDB `ASOF JOIN`). A matched row
    *   whose VALUES are all NULL is still matched — inner keeps it.
    * @param tolerance maximum allowed timestamp gap (pandas `merge_asof`
    *   semantics): the matched row is still the LATEST at-or-before one,
    *   but if its gap `leftTs - rightTs` exceeds the tolerance the match is
    *   voided — NULL under `"left"`, dropped under `"inner"`. The value is
    *   compared against the difference of the two timestamp columns, so its
    *   type follows theirs (numeric ts → numeric tolerance, TIMESTAMP ts →
    *   an interval expression). Never widens the match — a nearer
    *   NON-qualifying row is not skipped in favor of an older qualifying
    *   one (exactly pandas/QuestDB TOLERANCE behavior).
    * @note right side should be unique per (by, rightTs); with duplicates the
    *   surviving row follows sort-tie order (same caveat as DuckDB ASOF).
    * @note NULL semantics match SQL ASOF: right rows with a NULL key or NULL
    *   timestamp never match (pre-filtered); left rows with a NULL key or
    *   NULL timestamp get NULL outputs (NULL = NULL is not a match) — and
    *   are dropped under `"inner"`. */
  def backward(left: DataFrame, right: DataFrame, by: String,
               leftTs: String, rightTs: String,
               valueCols: Map[String, String],
               joinType: String = "left",
               tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, by, leftTs, rightTs, valueCols,
      forwardDir = false, joinType, tolerance)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` in the same key group ("next purchase after this
    * impression"). Same union-and-sweep, descending timestamp order —
    * identical cost profile to [[backward]], same `joinType`/`tolerance`
    * contract (the gap is `rightTs - leftTs`). */
  def forward(left: DataFrame, right: DataFrame, by: String,
              leftTs: String, rightTs: String,
              valueCols: Map[String, String],
              joinType: String = "left",
              tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, by, leftTs, rightTs, valueCols,
      forwardDir = true, joinType, tolerance)

  /** Reserved match-struct field carrying the matched row's timestamp for
    * the tolerance check. */
  private val MatchTsField = "__asof_mts"

  private def asofImpl(left: DataFrame, right: DataFrame, by: String,
                       leftTs: String, rightTs: String,
                       valueCols: Map[String, String],
                       forwardDir: Boolean, joinType: String,
                       tolerance: Option[Column]): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"joinType must be 'left' or 'inner', got '$joinType'")
    require(!valueCols.values.exists(_ == MatchTsField),
      s"output name $MatchTsField is reserved")
    val vals = valueCols.toSeq
    val leftPayload = left.columns.toSeq.filterNot(_ == by)
    // with a tolerance the struct also carries the matched row's timestamp,
    // so the gap check reads the SAME row the sweep selected
    val structFields = vals ++
      (if (tolerance.isDefined) Seq(rightTs -> MatchTsField) else Nil)
    val matchType = StructType(structFields.map { case (rc, out) =>
      StructField(out, right.schema(rc).dataType, nullable = true) })
    // common schema: by, __ats (event time), __side (0=right, 1=left),
    // left payload (null on right rows), __v match-struct (null on left
    // rows; non-null on every right row even when its fields are null,
    // so ignoreNulls skips only the left rows interleaved in the sweep)
    val l2 = left.select(
      (col(by) +: col(leftTs).as("__ats") +: lit(1).as("__side") +:
        leftPayload.map(c => col(c).as(s"__l_$c"))) :+
        lit(null).cast(matchType).as("__v"): _*)
    // SQL equality never matches NULL keys/timestamps: drop them up front
    // rather than letting Window.partitionBy group NULL keys together.
    val r2 = right
      .where(col(by).isNotNull && col(rightTs).isNotNull)
      .select(
        (col(by) +: col(rightTs).as("__ats") +: lit(0).as("__side") +:
          leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c"))) :+
          struct(structFields.map { case (rc, out) => col(rc).as(out) }: _*).as("__v"): _*)
    // Backward sweeps ascending; forward sweeps DESCENDING so the running
    // last is the earliest right row at-or-after. Either way NULL-ts left
    // rows must sort before every right row (nulls_first) so the sweep sees
    // no match for them — desc defaults to nulls_last, hence the explicit
    // ordering.
    val ord = if (forwardDir) col("__ats").desc_nulls_first
              else col("__ats").asc_nulls_first
    val w = Window.partitionBy(by)
      .orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-ts left rows sort before every (non-null-ts) right row in their
    // partition, so the running last sees no match — NULL out, as required.
    val swept0 = l2.unionByName(r2)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
    // tolerance voids an out-of-range match IN PLACE (never widens to an
    // older qualifying row — pandas merge_asof semantics); a NULL __m keeps
    // the condition NULL → stays unmatched
    val swept = tolerance match {
      case None => swept0
      case Some(tol) =>
        val mts = col("__m").getField(MatchTsField)
        val gap = if (forwardDir) mts - col("__ats") else col("__ats") - mts
        swept0.withColumn("__m", when(col("__m").isNotNull && gap <= tol, col("__m")))
    }
    // the match STRUCT is non-null for every matched row (even when all its
    // fields are NULL), so it doubles as the inner-join survival predicate
    val kept =
      if (joinType == "inner") col("__side") === 1 && col("__m").isNotNull
      else col("__side") === 1
    swept.where(kept)
      .select(col(by) +: leftPayload.map(c => col(s"__l_$c").as(c)) ++:
        vals.map { case (_, out) => col("__m").getField(out).as(out) }: _*)
  }
}
