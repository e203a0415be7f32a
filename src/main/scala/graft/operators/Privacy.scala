package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort-size privacy screens — the structural complement to
  * [[graft.functions.Scrub.redactPii]]'s pattern-level redaction: PII
  * regexes catch emails and phone numbers, but a COMBINATION of innocuous
  * columns (language × source × length bucket × date) can still isolate an
  * individual document or author. The k-anonymity discipline: no released
  * row may belong to a quasi-identifier cohort smaller than k.
  *
  * Relational end to end: cohort sizes are ONE hash aggregation on the
  * quasi-identifier columns (partial-agg bounded), the verdict joins back
  * on the same key — no windows, no sorts, key-bounded shuffles at any
  * corpus size. Suppression (drop the row) and generalization (coarsen a
  * column, then re-check) compose: generalize with ordinary Column
  * expressions, re-run the screen.
  *
  * No reference analog (operators.py:80 delegates everything to Postgres);
  * SURVEY §2c text-curation territory. NULL quasi-identifier values form
  * their own cohort per combination (SQL group-by semantics). */
object Privacy {

  /** Keep only rows whose quasi-identifier combination occurs at least
    * `k` times — the suppression form of k-anonymity. */
  def suppressRareCombinations(df: DataFrame, quasiIdCols: Seq[String],
                               k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "quasiIdCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    // null-SAFE join back: groupBy cohorts NULL values together, and the
    // survive-check must too — a plain equi-join would silently drop every
    // NULL-valued cohort regardless of its size
    val counts = df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("__cohort_n"))
      .where(col("__cohort_n") >= k)
      .select(quasiIdCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__q$i") }: _*)
    val cond = quasiIdCols.zipWithIndex
      .map { case (c, i) => col(c) <=> col(s"__q$i") }.reduce(_ && _)
    df.join(counts, cond, "left_semi")
  }

  /** The audit view: every quasi-identifier cohort with its size and
    * whether it passes `k` — what a release review reads BEFORE deciding
    * between suppression and generalization. Output: quasiIdCols ++
    * (cohort_n, anonymous) — one row per cohort, sorted smallest first so
    * the risk surfaces at the top. */
  def cohortReport(df: DataFrame, quasiIdCols: Seq[String],
                   k: Long): DataFrame = {
    require(quasiIdCols.nonEmpty, "quasiIdCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("cohort_n"))
      .withColumn("anonymous", col("cohort_n") >= k)
      .orderBy(col("cohort_n").asc +: quasiIdCols.map(col): _*)
  }

  /** Fraction of rows that would survive [[suppressRareCombinations]] at
    * each candidate k — the utility/privacy frontier in one pass over the
    * cohort sizes (the cohort aggregate runs once; each k is a sum over
    * the ≤|cohorts| rows). */
  def retentionCurve(df: DataFrame, quasiIdCols: Seq[String],
                     ks: Seq[Long]): DataFrame = {
    require(quasiIdCols.nonEmpty && ks.nonEmpty, "need columns and ks")
    require(ks.forall(_ >= 1), "every k must be >= 1")
    val cohorts = df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val total = sum(col("__n"))
    val curves = ks.map(k =>
      (coalesce(sum(when(col("__n") >= k, col("__n"))), lit(0L))
        .cast("double") / total).as(s"retained_k$k"))
    cohorts.agg(curves.head, curves.tail: _*)
  }
}
