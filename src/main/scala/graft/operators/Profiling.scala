package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`-style per-column summary a pipeline runs
  * before trusting a new data drop: row count, null count, exact distinct
  * count, min/max (as strings, so heterogeneous columns share one schema).
  *
  * Shape: ONE aggregation pass over the table computing all columns' stats
  * together (multiple exact count-distincts plan as a single Expand — one
  * scan, rows multiplied by the column count), then a `stack` unpivot to one
  * row per column. Exact distincts are the trust-the-data default; at
  * extreme scale swap `countDistinct` for `approx_count_distinct` (HLL,
  * no Expand) — the profile schema is unchanged. */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __null_$c, __nd_$c, __min_$c, __max_$c").mkString(", ")
    one.select(col("__n"),
        expr(s"stack(${cols.size}, $stacked) AS " +
          "(column_name, n_nulls, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("__n").as("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
