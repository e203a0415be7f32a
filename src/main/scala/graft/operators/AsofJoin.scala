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
    * @param allowExactMatches `true` (default) matches inclusively
    *   (`rightTs <= leftTs`, DuckDB `>=`); `false` is the strict form
    *   (`rightTs < leftTs`, DuckDB `>`) — pandas `allow_exact_matches` —
    *   implemented purely as a sort-tie flip, same cost. Applies to all
    *   three directions (under [[nearest]] an equal-ts right row is
    *   excluded from BOTH candidate sides).
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
               tolerance: Option[Column] = None,
               allowExactMatches: Boolean = true): DataFrame =
    asofImpl(left, right, by, leftTs, rightTs, valueCols,
      forwardDir = false, joinType, tolerance, allowExactMatches)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` in the same key group ("next purchase after this
    * impression"). Same union-and-sweep, descending timestamp order —
    * identical cost profile to [[backward]], same `joinType`/`tolerance`
    * contract (the gap is `rightTs - leftTs`). */
  def forward(left: DataFrame, right: DataFrame, by: String,
              leftTs: String, rightTs: String,
              valueCols: Map[String, String],
              joinType: String = "left",
              tolerance: Option[Column] = None,
              allowExactMatches: Boolean = true): DataFrame =
    asofImpl(left, right, by, leftTs, rightTs, valueCols,
      forwardDir = true, joinType, tolerance, allowExactMatches)

  /** Nearest as-of join (pandas `merge_asof direction='nearest'`): for each
    * left row, whichever of the backward match (latest at-or-before) and the
    * forward match (earliest at-or-after) has the SMALLER absolute timestamp
    * gap; the backward match wins exact ties (pandas tie order). With a
    * `tolerance`, each side is voided independently when ITS gap exceeds the
    * bound and the pick runs over the survivors — equivalent to pandas'
    * |gap| ≤ tolerance test.
    *
    * Cost: the same single shuffle on the key, then TWO incremental window
    * sweeps over it (one ascending, one descending — one extra sort, no
    * extra exchange). Deliberately NOT one sweep plus an
    * unbounded-following frame: Spark evaluates [currentRow,
    * unboundedFollowing] frames by re-aggregating the remaining rows per
    * row — O(n²) per key — while two running frames stay O(n log n). */
  def nearest(left: DataFrame, right: DataFrame, by: String,
              leftTs: String, rightTs: String,
              valueCols: Map[String, String],
              joinType: String = "left",
              tolerance: Option[Column] = None,
              allowExactMatches: Boolean = true): DataFrame =
    asofNearest(left, right, by, leftTs, rightTs, valueCols, joinType,
      tolerance, allowExactMatches)

  /** Reserved match-struct field carrying the matched row's timestamp for
    * the tolerance / nearest-gap check. */
  private val MatchTsField = "__asof_mts"

  /** Tagged union of both inputs on the common sweep schema: by, __ats
    * (event time), __side (0=right, 1=left), left payload (null on right
    * rows), __v match-struct (null on left rows; non-null on every right
    * row even when its fields are null, so ignoreNulls skips only the left
    * rows interleaved in the sweep). With `withMatchTs` the struct also
    * carries the matched row's timestamp, so gap checks read the SAME row
    * the sweep selected. */
  private def prepare(left: DataFrame, right: DataFrame, by: String,
                      leftTs: String, rightTs: String,
                      vals: Seq[(String, String)], joinType: String,
                      withMatchTs: Boolean): DataFrame = {
    require(joinType == "left" || joinType == "inner",
      s"joinType must be 'left' or 'inner', got '$joinType'")
    require(!vals.exists(_._2 == MatchTsField),
      s"output name $MatchTsField is reserved")
    val leftPayload = left.columns.toSeq.filterNot(_ == by)
    val structFields = vals ++
      (if (withMatchTs) Seq(rightTs -> MatchTsField) else Nil)
    val matchType = StructType(structFields.map { case (rc, out) =>
      StructField(out, right.schema(rc).dataType, nullable = true) })
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
    l2.unionByName(r2)
  }

  /** Incremental running frame over the keyed sweep: ascending for the
    * backward direction, DESCENDING for forward (so the running last is the
    * earliest right row at-or-after). Either way NULL-ts left rows must
    * sort before every right row (nulls_first) so the sweep sees no match
    * for them — desc defaults to nulls_last, hence the explicit ordering.
    * Right rows sort before left rows at equal timestamps (__side) — as-of
    * is inclusive on both directions. */
  private def runningFrame(by: String, descending: Boolean,
                           allowExact: Boolean) = {
    val ord = if (descending) col("__ats").desc_nulls_first
              else col("__ats").asc_nulls_first
    // inclusive as-of: right rows (side 0) sort BEFORE left rows at equal
    // timestamps, inside the running frame. Strict (allow_exact_matches =
    // false) flips the tie so equal-ts right rows land AFTER the left row —
    // outside its frame — in either sweep direction.
    val tie = if (allowExact) col("__side").asc else col("__side").desc
    Window.partitionBy(by)
      .orderBy(ord, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** Keep matched/all left rows per `joinType` and unwrap the match struct.
    * The struct is non-null for every matched row (even when all its fields
    * are NULL), so it doubles as the inner-join survival predicate. */
  private def finish(swept: DataFrame, left: DataFrame, by: String,
                     vals: Seq[(String, String)], joinType: String): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(_ == by)
    val kept =
      if (joinType == "inner") col("__side") === 1 && col("__m").isNotNull
      else col("__side") === 1
    swept.where(kept)
      .select(col(by) +: leftPayload.map(c => col(s"__l_$c").as(c)) ++:
        vals.map { case (_, out) => col("__m").getField(out).as(out) }: _*)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, by: String,
                       leftTs: String, rightTs: String,
                       valueCols: Map[String, String],
                       forwardDir: Boolean, joinType: String,
                       tolerance: Option[Column],
                       allowExact: Boolean): DataFrame = {
    val vals = valueCols.toSeq
    val unioned = prepare(left, right, by, leftTs, rightTs, vals, joinType,
      withMatchTs = tolerance.isDefined)
    // NULL-ts left rows sort before every (non-null-ts) right row in their
    // partition, so the running last sees no match — NULL out, as required.
    val swept0 = unioned.withColumn("__m",
      last(col("__v"), ignoreNulls = true)
        .over(runningFrame(by, forwardDir, allowExact)))
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
    finish(swept, left, by, vals, joinType)
  }

  private def asofNearest(left: DataFrame, right: DataFrame, by: String,
                          leftTs: String, rightTs: String,
                          valueCols: Map[String, String],
                          joinType: String,
                          tolerance: Option[Column],
                          allowExact: Boolean): DataFrame = {
    val vals = valueCols.toSeq
    // the struct ALWAYS carries the match timestamp here — the nearest pick
    // needs both gaps even without a tolerance
    val unioned = prepare(left, right, by, leftTs, rightTs, vals, joinType,
      withMatchTs = true)
    // one shuffle, two incremental sweeps over it (asc = backward
    // candidate, desc = forward candidate); Catalyst stacks the two Window
    // execs over the same Exchange with one extra Sort between them
    val swept2 = unioned
      .withColumn("__mb", last(col("__v"), ignoreNulls = true)
        .over(runningFrame(by, descending = false, allowExact)))
      .withColumn("__mf", last(col("__v"), ignoreNulls = true)
        .over(runningFrame(by, descending = true, allowExact)))
    val gb = col("__ats") - col("__mb").getField(MatchTsField)
    val gf = col("__mf").getField(MatchTsField) - col("__ats")
    // tolerance voids each candidate independently — equivalent to voiding
    // the picked winner (the winner's gap is the SMALLER one, so the farther
    // side can never survive a tolerance that kills the nearer), and ≡
    // pandas' |gap| ≤ tol test
    val b = tolerance.fold(col("__mb"))(tol =>
      when(col("__mb").isNotNull && gb <= tol, col("__mb")))
    val f = tolerance.fold(col("__mf"))(tol =>
      when(col("__mf").isNotNull && gf <= tol, col("__mf")))
    // backward wins exact ties (pandas nearest tie order); gaps re-derived
    // from the VOIDED candidates so a dropped side never wins the compare
    val bGap = col("__ats") - b.getField(MatchTsField)
    val fGap = f.getField(MatchTsField) - col("__ats")
    val swept = swept2
      .withColumn("__m",
        when(b.isNotNull && (f.isNull || bGap <= fGap), b)
          .when(f.isNotNull, f))
      .drop("__mb", "__mf")
    finish(swept, left, by, vals, joinType)
  }
}
