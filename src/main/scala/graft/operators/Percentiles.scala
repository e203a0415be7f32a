package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles via DISTRIBUTED SORT — the scale path.
  *
  * Spark's `percentile` aggregate collects every value of a group into ONE
  * aggregation buffer (`OpenHashMap` in the exact implementation) — correct
  * at test scale, but a single hot group at 100 TB materializes in one
  * executor's heap. This formulation ranks values with a window sort
  * (distributed, spillable), finds each quantile's two neighbor ranks, and
  * interpolates — identical results to `percentile(col, p)` (and DuckDB's
  * `QUANTILE_CONT`): all three use the same `h = (n−1)·p` linear
  * interpolation.
  *
  * Cost: one shuffle+sort of (group, value) — narrow rows, spill-friendly —
  * plus a join against the per-group quantile targets (`2·|ps|` rows per
  * group; AQE broadcasts it when small, shuffles when group cardinality is
  * extreme).
  */
object Percentiles {

  /** Exact percentiles of `valueCol` per `groupCol`: one output row per
    * group with columns named by `names` (parallel to `ps`). */
  def exactByGroup(df: DataFrame, groupCol: String, valueCol: String,
                   ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.size == names.size, "ps and names must align")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), "percentiles must be in [0,1]")
    val w = Window.partitionBy(groupCol).orderBy("__v")
    val ranked = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
    val counts = ranked.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    // tiny frame: one row per (group, quantile) with its neighbor ranks
    val wanted = counts.select(col(groupCol), col("__n"),
        explode(array(ps.zip(names).map { case (p, nm) =>
          struct(lit(p).as("p"), lit(nm).as("nm"))
        }: _*)).as("__q"))
      .select(col(groupCol), col("__q.nm").as("__nm"),
        ((col("__n") - 1).cast("double") * col("__q.p")).as("__h"))
      .select(col(groupCol), col("__nm"), col("__h"),
        (floor(col("__h")).cast("long") + 1).as("__lo"),
        (ceil(col("__h")).cast("long") + 1).as("__hi"))
    // no forced broadcast: `wanted` is 2·|ps| rows per GROUP, so a
    // high-cardinality group column could blow past the broadcast limit —
    // AQE picks broadcast when it fits and a shuffle join when it doesn't
    val hits = ranked.join(wanted, Seq(groupCol))
      .where(col("__rn") === col("__lo") || col("__rn") === col("__hi"))
      .groupBy(groupCol, "__nm", "__h", "__lo")
      .agg(max(when(col("__rn") === col("__lo"), col("__v"))).as("__vlo"),
        max(when(col("__rn") === col("__hi"), col("__v"))).as("__vhi"))
      .withColumn("__val", {
        // (1−d)·lower + d·higher — Spark's own interpolation spelling in the
        // percentile aggregate; lower + d·(higher−lower) differs in the last
        // ulp and would break the bit-identity pin
        val d = col("__h") - (col("__lo") - 1).cast("double")
        (lit(1.0) - d) * col("__vlo") + d * col("__vhi")
      })
    // pivot quantiles into columns, preserving the caller's names; groups
    // whose values are ALL NULL re-attach with NULL percentiles (matching
    // percentile()/QUANTILE_CONT, which ignore NULLs but keep the group)
    val agged = hits.groupBy(groupCol).pivot("__nm", names).agg(first("__val"))
    df.select(col(groupCol)).distinct()
      .join(agged, Seq(groupCol), "left")
      .select(col(groupCol) +: names.map(col): _*)
  }
}
