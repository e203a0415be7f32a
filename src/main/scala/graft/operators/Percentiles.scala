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

  /** Exact GLOBAL quantiles of one column — the no-group-key case that
    * [[exactByGroup]] cannot serve at scale (a constant group key turns its
    * ranking window into ONE partition holding the whole column).
    *
    * Scale design — the same distributed-scan recipe as
    * [[Packing.packSequences]]: `repartitionByRange` on the value (range
    * partition i holds values ≤ range partition i+1, so partition ids follow
    * the global order), per-partition COUNTS prefix-scanned on the driver
    * (one long per partition), then global rank = partition offset +
    * partition-LOCAL `row_number`. The only single-point data is `partitions`
    * longs plus the ≤ 2·|ps| neighbor values collected at the end — every
    * sort is partition-local and spillable, so the pass survives any column
    * size. Interpolation is the identical `(1−d)·lower + d·higher` at
    * `h = (n−1)·p` as [[exactByGroup]], `percentile()` and DuckDB's
    * `QUANTILE_CONT`.
    *
    * Returns one value per requested quantile, driver-side (quantiles are
    * model artifacts, like [[Profiling.standardize]]'s μ/σ); `None` when the
    * column has no non-NULL values. NULLs are ignored, as everywhere.
    */
  def exactGlobalValues(df: DataFrame, valueCol: String, ps: Seq[Double],
                        partitions: Int = 0): Seq[Option[Double]] =
    exactGlobalValuesMulti(df, Seq(valueCol), ps, partitions)(valueCol)

  /** [[exactGlobalValues]] for SEVERAL columns in ONE input scan — the
    * multi-column fit [[Profiling.robustScale]] needs (a per-column loop
    * re-executes the whole upstream plan per column).
    *
    * Recipe: melt to narrow (column-index, value) pairs with `posexplode`,
    * then `repartitionByRange` on the COMPOSITE key (index, value) — the
    * leading index groups each column's values into a contiguous span of
    * range partitions while the trailing value still splits every column
    * ACROSS ~p/|cols| partitions, so no column ever lands in one partition
    * (the failure mode that rules out a melt through [[exactByGroup]], whose
    * per-group ranking window is one partition per column). A range boundary
    * may straddle two columns, so counts/offsets are keyed by
    * (partition, column). Driver-side state: |partitions|·|cols| longs plus
    * the ≤ 2·|ps|·|cols| neighbor values — model artifacts, not data.
    *
    * Returns quantiles keyed by column name; a column with no non-NULL
    * values maps to all-`None`. Interpolation is the identical
    * `(1−d)·lower + d·higher` at `h = (n−1)·p` as everywhere here. */
  def exactGlobalValuesMulti(df: DataFrame, valueCols: Seq[String],
                             ps: Seq[Double], partitions: Int = 0)
      : Map[String, Seq[Option[Double]]] = {
    require(ps.nonEmpty, "ps must be non-empty")
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    require(ps.forall(p => p >= 0.0 && p <= 1.0), "percentiles must be in [0,1]")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val c = valueCols.size
    // persisted so the count pass and the rank pass see the SAME range
    // boundaries (they come from sampling the input) — narrow (int, double)
    val base = df
      .select(posexplode(array(valueCols.map(cn => col(cn).cast("double")): _*))
        .as(Seq("__ci", "__v")))
      .where(col("__v").isNotNull)
      .repartitionByRange(p, col("__ci"), col("__v"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = base.groupBy("__pid", "__ci").agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val nByCol: Map[Int, Long] =
        counts.groupBy(_._1._2).map { case (ci, m) => ci -> m.values.sum }
      if (counts.isEmpty)
        return valueCols.map(_ -> ps.map(_ => None)).toMap
      // per-(partition, column) global-rank offsets: scan partitions in id
      // order independently per column (partition ids follow value order
      // within each column's contiguous partition span)
      val offsetMap: Map[(Int, Int), Long] = (0 until c).flatMap { ci =>
        var acc = 0L
        (0 until p).flatMap { pid =>
          counts.get((pid, ci)).map { cnt =>
            val entry = (pid, ci) -> acc; acc += cnt; entry
          }
        }
      }.toMap
      val offsetOf = element_at(
        map(offsetMap.toSeq.flatMap { case ((pid, ci), o) =>
          Seq(lit(pid.toLong * c + ci), lit(o))
        }: _*),
        col("__pid").cast("long") * c + col("__ci"))
      val w = Window.partitionBy("__pid", "__ci").orderBy("__v")
      val targetsByCol: Map[Int, Seq[Long]] = nByCol.map { case (ci, n) =>
        ci -> ps.flatMap { q =>
          val h = (n - 1).toDouble * q
          Seq(math.floor(h).toLong + 1, math.ceil(h).toLong + 1)
        }.distinct
      }
      // ≤ 2·|ps|·|cols| rows back to the driver — a model artifact, not data
      val at = base
        .withColumn("__rn", offsetOf + row_number().over(w))
        .where(targetsByCol.map { case (ci, ts) =>
          col("__ci") === ci && col("__rn").isin(ts: _*)
        }.reduce(_ || _))
        .select(col("__ci"), col("__rn"), col("__v"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
      valueCols.zipWithIndex.map { case (cn, ci) =>
        cn -> (nByCol.get(ci) match {
          case None => ps.map(_ => None)
          case Some(n) => ps.map { q =>
            val h = (n - 1).toDouble * q
            val lo = math.floor(h).toLong + 1
            val hi = math.ceil(h).toLong + 1
            val d = h - math.floor(h)
            Some((1.0 - d) * at((ci, lo)) + d * at((ci, hi)))
          }
        })
      }.toMap
    } finally base.unpersist()
  }
}
