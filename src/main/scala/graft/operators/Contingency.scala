package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pearson chi-squared independence + Cramér's V (Pearson 1900; Cramér
  * 1946) — the categorical-association read a curation pipeline runs over
  * its metadata facets: "is language independent of source?", "does event
  * type depend on the value band?" — the screen that tells you whether a
  * per-source mixture decision silently skews languages. Complements the
  * numeric association family (x29 Pearson, x125 Spearman) on the
  * categorical axis, and x39b's categorical drift (which compares ONE
  * facet across two snapshots; this tests TWO facets against each other).
  * No reference analog (`operators.py:80` delegates to Postgres); SURVEY
  * §2c extension.
  */
object Contingency {

  /** One row `(n, r, c, dof, chi2, cramers_v)` for the two categorical
    * columns. Zero-observed cells contribute their full expectation to the
    * statistic — accounted WITHOUT materializing the R×C spine via the
    * identity `χ² = Σ_all (o−e)²/e = n + Σ_present ((o−e)²/e − e)` (the
    * absent cells' Σe is n minus the present cells' Σe), so the plan never
    * builds empty cells. `cramers_v = √(χ² / (n·(min(r,c)−1)))`; both are
    * NULL when either facet is constant (dof = 0 — independence is
    * vacuous). NULL category values fail loudly: silently dropping them
    * would bias every margin (map NULL to a sentinel upstream if "missing"
    * is a real category).
    *
    * Shape: one (a, b)-keyed count shuffle (map-side partials) collapses
    * the corpus to its occupied cells; margins and totals re-aggregate
    * THAT frame (cell-cardinality-bounded) and broadcast back; the
    * statistic is one aggregate over occupied cells. The cell frame feeds
    * four consumers, so the STATIC plan prints four corpus scans — at
    * runtime AQE exchange reuse collapses them to ONE scan + one shuffle
    * (the cell exchange subtree is identical across consumers; measured:
    * an eager localCheckpoint cut was 1.4–2.0× SLOWER at both 1× and 100×
    * than letting reuse do it, so reuse is the contract here and
    * PlanQualitySpec pins it — if that pin ever fires, reinstate the
    * Iteration.cut spelling this comment replaced).
    *
    * Determinism: counts and margins are exact integers; each cell's
    * contribution is a fixed IEEE expression, but the final Σ over cells
    * is a fold whose order Spark and DuckDB need not share — consumers
    * hash-pinning should canonicalize chi2/cramers_v (the gate pins
    * round6; cell contributions are O(1..n) doubles, so fold divergence
    * sits ~1e-10 below that pin). */
  /** Chi-squared GOODNESS OF FIT against uniform expectation (Pearson
    * 1900 — the one-sample complement of [[chi2Independence]]): one row
    * `(n, k, dof, chi2)` testing whether the observed category counts of
    * `colA` are consistent with all-equal frequencies — the label-balance
    * / shard-balance / day-of-week-uniformity screen. `e = n/k` for every
    * OBSERVED category (absent categories are unknowable without an
    * explicit expectation — supply one by unioning zero-count rows
    * upstream if the category universe is closed); chi2 NULL at k = 1
    * (dof 0). Same determinism story as chi2Independence: counts exact,
    * one fold over k cells, round6 in the gate. One count shuffle, k-row
    * artifact math. */
  def chi2Uniformity(df: DataFrame, colA: String): DataFrame = {
    val guard = when(col(colA).isNull,
        raise_error(lit(s"chi2Uniformity: NULL $colA — map missing to a " +
          "sentinel category upstream")))
      .otherwise(col(colA))
    val cells = df.select(guard.as("__a"))
      .groupBy("__a").agg(count(lit(1)).as("__o"))
    val tot = cells.agg(sum("__o").as("n"), count(lit(1)).as("k"))
    cells.crossJoin(broadcast(tot))
      .select(col("n"), col("k"),
        (col("__o").cast("double")
          - col("n").cast("double") / col("k").cast("double")).as("__d"),
        (col("n").cast("double") / col("k").cast("double")).as("__e"))
      .groupBy("n", "k")
      .agg(sum(col("__d") * col("__d") / col("__e")).as("__chi2"))
      .select(col("n"), col("k"), (col("k") - 1).as("dof"),
        when(col("k") === 1, lit(null).cast("double"))
          .otherwise(col("__chi2")).as("chi2"))
  }

  /** Mutual information between two categorical facets, in nats: one row
    * `(n, r, c, h_a, h_b, mi, nmi)` — `mi = Σ_cells p_ij·ln(p_ij/(p_i·p_j))`
    * over OCCUPIED cells (empty cells contribute 0·ln0 = 0, so unlike
    * [[chi2Independence]] no absent-cell accounting is needed at all),
    * `h_a`/`h_b` the facet entropies, and `nmi = mi / ((h_a + h_b)/2)`
    * (arithmetic-mean normalization, Strehl & Ghosh JMLR'02) — NULL when
    * either facet is constant (its entropy is 0 and "shared information"
    * is vacuous). The feature-redundancy read next to chi2's significance
    * read: chi2 grows with n at fixed association, MI measures the
    * association itself.
    *
    * Same shape as chi2: one (a, b)-keyed count shuffle, margins
    * re-aggregated from the cell frame (AQE exchange reuse collapses the
    * static plan's repeated scans — the pinned contract), one final fold.
    * Every p is an exact-integer ratio; ln is the one libm op and the
    * final Σ the one cross-engine fold — consumers hash-pinning should
    * canonicalize (the gate pins round6). */
  def mutualInformation(df: DataFrame, colA: String, colB: String)
      : DataFrame = {
    val guard = when(col(colA).isNull || col(colB).isNull,
        raise_error(lit(s"mutualInformation: NULL $colA/$colB — map " +
          "missing to a sentinel category upstream")))
      .otherwise(col(colA))
    val cells = df.select(guard.as("__a"), col(colB).as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
    val rowM = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val colM = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("n"),
      countDistinct("__a").as("r"), countDistinct("__b").as("c"))
    val nD = col("n").cast("double")
    val joined = cells
      .join(broadcast(rowM), Seq("__a"))
      .join(broadcast(colM), Seq("__b"))
      .crossJoin(broadcast(tot))
    val mi = joined.groupBy("n", "r", "c")
      .agg(sum((col("__o").cast("double") / nD)
        * log((col("__o").cast("double") * nD)
          / (col("__ra").cast("double") * col("__cb").cast("double"))))
        .as("mi"))
    def entropy(m: DataFrame, cnt: String) = m
      .crossJoin(broadcast(tot.select(col("n").as("__n"))))
      .agg(sum((col(cnt).cast("double") / col("__n").cast("double"))
        * log(col("__n").cast("double") / col(cnt).cast("double")))
        .as("h"))
    val hA = entropy(rowM, "__ra").select(col("h").as("h_a"))
    val hB = entropy(colM, "__cb").select(col("h").as("h_b"))
    mi.crossJoin(broadcast(hA)).crossJoin(broadcast(hB))
      .select(col("n"), col("r"), col("c"), col("h_a"), col("h_b"),
        col("mi"),
        when(col("r") === 1 || col("c") === 1, lit(null).cast("double"))
          .otherwise(col("mi") / ((col("h_a") + col("h_b")) / 2.0))
          .as("nmi"))
  }

  def chi2Independence(df: DataFrame, colA: String, colB: String)
      : DataFrame = {
    val guard = when(col(colA).isNull || col(colB).isNull,
        raise_error(lit(s"chi2Independence: NULL $colA/$colB — map missing " +
          "to a sentinel category upstream, a silent drop biases margins")))
      .otherwise(col(colA))
    val cells = df.select(guard.as("__a"), col(colB).as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
    val rowM = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val colM = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val tot = cells.agg(sum("__o").as("n"),
      countDistinct("__a").as("r"), countDistinct("__b").as("c"))
    val e = cells
      .join(broadcast(rowM), Seq("__a"))
      .join(broadcast(colM), Seq("__b"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        (col("__ra").cast("double") * col("__cb").cast("double")
          / col("n").cast("double")).as("__e"),
        col("__o").cast("double").as("__od"))
    e.groupBy("n", "r", "c")
      .agg(sum((col("__od") - col("__e")) * (col("__od") - col("__e"))
        / col("__e") - col("__e")).as("__partial"))
      .select(col("n"), col("r"), col("c"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        (col("n").cast("double") + col("__partial")).as("__chi2"))
      .select(col("n"), col("r"), col("c"), col("dof"),
        when(col("dof") === 0, lit(null).cast("double"))
          .otherwise(col("__chi2")).as("chi2"),
        when(col("dof") === 0, lit(null).cast("double"))
          .otherwise(sqrt(col("__chi2")
            / (col("n").cast("double")
              * (least(col("r"), col("c")) - 1).cast("double"))))
          .as("cramers_v"))
  }
}
