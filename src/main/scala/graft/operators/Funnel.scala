package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered event-funnel progression — the product-analytics staple
  * ("view → click → purchase: who got how far, in order?") a Postgres user
  * of the reference would spell with chained lateral MINs. No reference
  * analog (operators.py delegates everything to Postgres); SURVEY §2c
  * extension territory.
  */
object Funnel {

  /** Per key, the furthest PREFIX of `steps` completable as a time-ordered
    * subsequence of that key's events: `steps_completed ∈ [0, |steps|]`
    * and `converted` iff the whole funnel closed. Matching is
    * earliest-completion greedy — step k's timestamp is the MINIMUM event
    * time of type `steps(k)` STRICTLY after step k−1's — which is exact
    * for subsequence existence (taking the earliest valid occurrence
    * never forecloses a later step; any other witness starts no earlier).
    * Strictness means same-timestamp events never advance two steps at
    * once: an instantaneous view+click tie completes only the view — the
    * conservative read of "ordered".
    *
    * Shape: ONE filtered aggregation per step (min-ts per key, partial
    * map-side) plus a key-equi-join against the previous step's
    * |keys|-row frame — k scan-bound passes, no windows, no per-key event
    * buffering (unlike the sessionization fold, state never holds a
    * timeline). Keys with zero step-1 events report 0, not absence —
    * funnel DENOMINATORS are the point, so every non-NULL key in `events`
    * surfaces. NULL keys are DROPPED from both the stages and the
    * universe (the [[graft.operators.NearDup]] crossGroupDupMatrix
    * convention): NULL never equi-joins, so a NULL-key row could only
    * ever report steps_completed = 0 even when its events complete the
    * funnel — a silently wrong row, where exclusion is at least honest.
    * Attribute keys upstream if NULL-key events must count. */
  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    val keyed = events.where(col(keyCol).isNotNull)
    val stages = steps.zipWithIndex
      .foldLeft(List.empty[DataFrame]) { case (acc, (st, i)) =>
        val base = keyed.where(col(typeCol) === lit(st))
          .select(col(keyCol), col(tsCol).as("__ts"))
        val eligible = acc.headOption match {
          case None => base
          case Some(prev) => base
            .join(prev, Seq(keyCol))
            .where(col("__ts") > col(s"__t${i - 1}"))
            .select(col(keyCol), col("__ts"))
        }
        eligible.groupBy(keyCol).agg(min("__ts").as(s"__t$i")) :: acc
      }.reverse
    val assembled = stages.foldLeft(keyed.select(col(keyCol)).distinct()) {
      (acc, m) => acc.join(m, Seq(keyCol), "left")
    }
    assembled
      // __t_i non-null implies __t_{i-1} non-null by construction, so the
      // indicator sum IS the completed prefix length
      .withColumn("steps_completed",
        steps.indices.map(i =>
          when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("converted", col("steps_completed") === steps.size.toLong)
      .select(col(keyCol), col("steps_completed"), col("converted"))
  }
}
