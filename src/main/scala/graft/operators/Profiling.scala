package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`-style per-column summary a pipeline runs
  * before trusting a new data drop: row count, null count, exact distinct
  * count, min/max (as strings, so heterogeneous columns share one schema).
  *
  * Shape: one aggregation branch PER COLUMN, unioned. A single combined
  * aggregate with N exact count-distincts would plan as an Expand (every row
  * replicated N+1 times through the shuffle); per-column branches each plan
  * a plain two-phase distinct aggregate AND a column-pruned scan — on
  * columnar storage each branch reads exactly one column, so total bytes
  * read match the fused form while the shuffle carries distinct values
  * instead of replicated rows. Branch count = profiled columns, each a tiny
  * independent job — trivially parallel on a cluster. */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** The extreme-scale variant: `approx_count_distinct` (HLL, bounded sketch
    * per partition — no distinct-value shuffle at all) in the same per-column
    * branch shape. This is the documented swap-point when a profiled column
    * is near-unique at 100 TB and the exact distinct's two-phase aggregate
    * would shuffle ~every value; `rsd` is the HLL's target relative error. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, 1)).as("n_nulls"),
        distinctAgg(c).as("n_distinct"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_.unionAll(_))
  }
}
