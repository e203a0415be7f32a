package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sided CUSUM change-point statistics (Page 1954, Biometrika 41) —
  * the sequential drift monitor a pipeline runs over per-source daily
  * health series (ingest counts, filter pass rates, mean quality): "has
  * this metric drifted from its in-control level, and since when?"
  * Complements the distributional drift family (x39 PSI, x39b categorical,
  * x76 embedding): those compare two SNAPSHOTS; CUSUM localizes WHEN a
  * monitored series left its target level. No reference analog
  * (`operators.py:80` delegates to Postgres); SURVEY §2c extension.
  *
  * The recursion `S⁺_i = max(0, S⁺_{i-1} + (x_i − target − k))` looks
  * sequential, but unrolls to a closed form over prefix sums: with
  * `y_i = x_i − target − k` and `P_i = Σ_{j≤i} y_j`,
  *
  *   `S⁺_i = max_{0≤j≤i} (P_i − P_j) = P_i − min(0, min_{j≤i} P_j)`
  *
  * (P_0 = 0 is the empty prefix) — one ordered cumulative sum plus one
  * ordered running min per side, both plain window aggregates. No
  * iteration, no UDF, no per-key driver state.
  */
object ChangePoint {

  /** Adds two-sided non-resetting CUSUM columns to a keyed ordered series:
    * `cusum_up` / `cusum_dn` (the S⁺/S⁻ statistics against drift above /
    * below `target ± allowance`) and `alarm_up` / `alarm_dn`
    * (level-crossings of `threshold`). The statistic does NOT reset after
    * an alarm (the alarm column marks every crossing row; a consumer
    * wanting first-alarm-only takes `min(orderCol) WHERE alarm`): resetting
    * re-introduces the sequential dependency the closed form removes, and
    * the non-reset variant's alarm SET is a superset — fail-loud, not
    * fail-silent.
    *
    * `target`, `allowance`, `threshold` are per-row columns (so per-key
    * in-control levels join in upstream); they must be constant within a
    * key or the recursion the closed form replays is ill-defined — that
    * precondition is the caller's, as is `orderCol` uniqueness per key
    * (duplicate order values make "the series" ambiguous). NULLs in the
    * value, target, allowance, or order fail loudly.
    *
    * Shape: ONE hash shuffle on `keyCol` + an in-partition sort serves all
    * four window columns (same partitioning + ordering); everything else is
    * map-side arithmetic. At 100 TB the frame partitions by key — no
    * global order anywhere.
    *
    * Determinism: when `valueCol`, `target`, and `allowance` are
    * integer-valued (counts against an integer level — the monitoring
    * case), every prefix sum is exactly representable and the statistics
    * are fold-order-free, hash-pinnable doubles; fractional inputs are
    * subject to the usual ordered-fold ulps and should be canonicalized by
    * the consumer. */
  def cusum(df: DataFrame, keyCol: String, orderCol: String,
            valueCol: String, target: Column, allowance: Column,
            threshold: Column): DataFrame = {
    def guard(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"cusum: NULL $what — drop or impute upstream"))).otherwise(c)
    // the order guard rides the value expression (a standalone guard
    // column would be pruned away unevaluated)
    val v = when(col(orderCol).isNull, raise_error(lit(
        s"cusum: NULL order ($orderCol) — drop or impute upstream")))
      .otherwise(guard(col(valueCol), s"value ($valueCol)")).cast("double")
    val t = guard(target, "target").cast("double")
    val k = guard(allowance, "allowance").cast("double")
    val h = guard(threshold, "threshold").cast("double")
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // prefix sums first, running mins second: window functions don't nest,
    // but both Window nodes share one partitioning + ordering, so the plan
    // pays a single shuffle + sort for all four columns
    df.withColumn("__p_up", sum(v - t - k).over(w))
      .withColumn("__p_dn", sum(t - v - k).over(w))
      .withColumn("cusum_up",
        col("__p_up") - least(min("__p_up").over(w), lit(0.0)))
      .withColumn("cusum_dn",
        col("__p_dn") - least(min("__p_dn").over(w), lit(0.0)))
      .withColumn("alarm_up", col("cusum_up") > h)
      .withColumn("alarm_dn", col("cusum_dn") > h)
      .drop("__p_up", "__p_dn")
  }
}
