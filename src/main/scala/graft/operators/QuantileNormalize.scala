package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pooled quantile normalization (Bolstad et al. Bioinformatics'03,
  * generalized to unequal group sizes) — the scorer-harmonization step a
  * mixture build needs when per-source signals share MEANING but not SCALE
  * (two quality classifiers, two perplexity models, lengths under
  * different tokenizers): replace each value by the POOLED distribution's
  * quantile at that value's within-group rank, so every group's output is
  * identically distributed (the pooled distribution) while within-group
  * ORDER is exactly preserved. After it, one global threshold means the
  * same thing in every source. Rank-only sibling of x36d's robust scaling
  * (which shifts/scales but keeps each group's SHAPE). No reference analog
  * (`operators.py:80`); SURVEY §2c extension.
  */
object QuantileNormalize {

  /** Adds `normalized`: the pooled type-1 (lower) quantile at the row's
    * within-group tie-averaged mid-rank. Concretely, for a tied block in
    * group g with average rank r (exact half-integers), the target pooled
    * order statistic is `k = ⌈((2r − 1)·N) / (2·n_g)⌉` — all INTEGER
    * arithmetic (2r is an integer; the product runs in DECIMAL(38,0) with
    * integral `div`, because (2r−1)·N overflows BIGINT once N·n_g passes
    * ~9e18 — i.e. at exactly the corpus sizes this is for) — and
    * `normalized` is the k-th smallest pooled value. Ties within a group
    * stay tied after mapping; a singleton group maps to the pooled lower
    * median (k = ⌈N/2⌉) by the same formula, not a special case.
    *
    * Shape: per group, value-keyed counts + a per-group cumulative window
    * (one shuffle, distinct-value-bounded per group); the pooled CDF is a
    * cumulative window over GLOBAL distinct values (cardinality-bounded,
    * the x125/x124 discipline); the k → value probe is the MERGE pattern —
    * union query ranks and pooled boundaries on the shared rank axis and
    * take `min(pooled value) over [current, unbounded following]` — NOT a
    * theta join (a cum ≥ k join is |queries|×|boundaries| pairs, quadratic
    * in distinct values); then one equi-join back to rows on
    * (group, value). No row-level global window anywhere.
    *
    * Determinism: `normalized` is a pooled DATA VALUE selected by integer
    * comparisons — exactly reproducible cross-engine, no rounding pin.
    * NULL groups/values fail loudly. */
  def toPooled(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val guarded = df.withColumn("__qn_g",
      when(col(groupCol).isNull || col(valueCol).isNull,
        raise_error(lit(s"quantileNormalize: NULL $groupCol/$valueCol — " +
          "drop or impute upstream")))
        .otherwise(col(groupCol)))
    val v = col(valueCol).cast("double")
    // per-(group, value) tied blocks with 2·(average rank) as an integer:
    // 2r = 2·cum_prev + cnt + 1
    val blocks = guarded.select(col("__qn_g"), v.as("__qn_v"))
      .groupBy("__qn_g", "__qn_v").agg(count(lit(1)).as("__cnt"))
    val wg = Window.partitionBy("__qn_g").orderBy("__qn_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = blocks
      .withColumn("__r2",
        coalesce(sum("__cnt").over(wg), lit(0L)) * 2 + col("__cnt") + 1)
      .withColumn("__ng",
        sum("__cnt").over(Window.partitionBy("__qn_g")))
    // pooled CDF over global distinct values
    val pooled = guarded.select(v.as("__qn_v"))
      .groupBy("__qn_v").agg(count(lit(1)).as("__pc"))
      .withColumn("__cum", sum("__pc").over(
        Window.orderBy("__qn_v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bigN = pooled.agg(sum("__pc").as("__n"))
    // integer target rank k = ceil(((2r−1)·N) / (2·n_g)) — DECIMAL(38,0)
    // keeps the product exact where BIGINT would overflow (N·n_g > ~9e18);
    // integral `div` gives the exact floor, no decimal-division rounding
    val queries = ranked.crossJoin(broadcast(bigN))
      .withColumn("__k",
        expr("(CAST(__r2 - 1 AS DECIMAL(38,0)) * __n + 2 * __ng - 1) " +
          "div (2 * CAST(__ng AS DECIMAL(38,0)))"))
      .select(col("__qn_g"), col("__qn_v"), col("__k"))
    // merge pattern on the shared rank axis: each query needs the smallest
    // pooled value whose cum ≥ k; query rows sort BEFORE the boundary that
    // satisfies them at equal rank
    val qSide = queries.select(col("__k").as("__pos"), lit(0).as("__ord"),
      col("__qn_g"), col("__qn_v"), lit(null).cast("double").as("__pv"))
    val gType = queries.schema("__qn_g").dataType // group type, any
    val pSide = pooled.select(col("__cum").as("__pos"), lit(1).as("__ord"),
      lit(null).cast(gType).as("__qn_g"),
      lit(null).cast("double").as("__qn_v"), col("__qn_v").as("__pv"))
    val merged = qSide.unionByName(pSide)
      .withColumn("__normalized", min("__pv").over(
        Window.orderBy("__pos", "__ord")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val mapping = merged.where(col("__ord") === 0)
      .select(col("__qn_g"), col("__qn_v"),
        col("__normalized").as("normalized"))
    guarded.withColumn("__qn_v", v)
      .join(mapping, Seq("__qn_g", "__qn_v"))
      .drop("__qn_g", "__qn_v")
  }
}
