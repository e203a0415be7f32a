package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement over a long ratings frame — the label-quality
  * gate every human-annotated SFT / preference / eval dataset runs before
  * the labels are trusted (Cohen 1960; Fleiss 1971). Input shape is one row
  * per (item, rater, label); no reference analog (`operators.py:80` delegates
  * everything to Postgres) — SURVEY §2c extension territory, sibling of the
  * other label-QA members (x103 confident-learning flags, x120 SFT schema
  * validation).
  *
  * Determinism: every statistic here is a ratio of INTEGER aggregates
  * (agreement counts, marginal-count products, squared category counts) —
  * integer sums are fold-order-free, and the final IEEE divisions/
  * subtractions are spelled identically in the DuckDB oracle, so kappas are
  * bit-identical cross-engine with no rounding pin needed.
  *
  * Scale shape: one item-keyed shuffle each — the pairwise join co-partitions
  * both rating sides on the item key; the per-pair and per-category frames
  * that follow are |raters|²- and |labels|-bounded model artifacts, never
  * corpus-sized. Nothing collects to the driver.
  */
object Agreement {

  private def guarded(df: DataFrame, itemCol: String, raterCol: String,
                      labelCol: String): DataFrame =
    df.select(
      when(col(itemCol).isNull, raise_error(lit("agreement: NULL item")))
        .otherwise(col(itemCol)).as("__item"),
      when(col(raterCol).isNull, raise_error(lit("agreement: NULL rater")))
        .otherwise(col(raterCol)).as("__rater"),
      when(col(labelCol).isNull,
        raise_error(lit("agreement: NULL label — a missing rating must be " +
          "an absent row, not a NULL category")))
        .otherwise(col(labelCol)).as("__label"))

  /** Cohen's κ for every unordered rater pair, computed over the items BOTH
    * raters rated (the standard pairwise-deletion convention):
    *
    * {{{
    * po = |{i : a(i) = b(i)}| / n
    * pe = Σ_c  nA(c) · nB(c) / n²      (marginals over the co-rated items)
    * κ  = (po − pe) / (1 − pe)
    * }}}
    *
    * A pair in perfect chance-only agreement (pe = 1, i.e. both raters
    * constant and equal) has an undefined κ — reported as NULL rather than
    * an arbitrary convention, with po/pe still carried.
    *
    * Shape: ONE equi-self-join on the item key (co-partitioned hash join;
    * at most |raters|² rows per item), then pair-keyed integer aggregates;
    * the marginal-product term joins two |pairs|·|labels|-row frames.
    * Rating multisets must be one-per-(item, rater) — duplicates fail
    * loudly (a silent duplicate would double-count agreement). */
  def cohenKappaPairs(df: DataFrame, itemCol: String, raterCol: String,
                      labelCol: String): DataFrame = {
    val r = guarded(df, itemCol, raterCol, labelCol)
    val dupGuard = r.groupBy("__item", "__rater")
      .agg(count(lit(1)).as("__k"))
      .agg(max("__k").as("__mx"))
      .select(when(col("__mx") > 1,
        raise_error(lit("agreement: duplicate (item, rater) rating")))
        .otherwise(lit(1L)).as("__ok"))
    val a = r.select(col("__item"), col("__rater").as("rater_a"),
      col("__label").as("__la"))
    val b = r.select(col("__item"), col("__rater").as("rater_b"),
      col("__label").as("__lb"))
    val joined = a.join(b, Seq("__item"))
      .where(col("rater_a") < col("rater_b"))
      .crossJoin(broadcast(dupGuard))
    val agree = joined.groupBy("rater_a", "rater_b")
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("__la") === col("__lb"), 1L).otherwise(0L)).as("__agree"),
        // min of the guard literal (always 1L): keeps the duplicate check
        // in the plan — an unused guard column would be pruned away
        min("__ok").as("__ok"))
    // marginals over the CO-RATED items, so pe matches the po population;
    // the B side is renamed before the join — both frames share lineage,
    // and a margA("rater_a") === margB("rater_a") condition would resolve
    // to a trivially-true same-attribute predicate
    val margA = joined.groupBy("rater_a", "rater_b", "__la")
      .agg(count(lit(1)).as("__ca"))
    val margB = joined.groupBy("rater_a", "rater_b", "__lb")
      .agg(count(lit(1)).as("__cb"))
      .withColumnRenamed("rater_a", "__ra2")
      .withColumnRenamed("rater_b", "__rb2")
    val peNum = margA.join(margB,
        col("rater_a") === col("__ra2") &&
        col("rater_b") === col("__rb2") &&
        col("__la") === col("__lb"))
      .groupBy("rater_a", "rater_b")
      .agg(sum(col("__ca") * col("__cb")).as("__pe_num"))
    agree.join(peNum, Seq("rater_a", "rater_b"))
      .select(col("rater_a"), col("rater_b"),
        (col("n_items") * col("__ok")).as("n_items"),
        (col("__agree").cast("double") / col("n_items")).as("po"),
        (col("__pe_num").cast("double") / (col("n_items") * col("n_items")))
          .as("pe"))
      .withColumn("kappa",
        when(col("pe") === 1.0, lit(null).cast("double"))
          .otherwise((col("po") - col("pe")) / (lit(1.0) - col("pe"))))
  }

  /** Fleiss' κ for a fixed-size panel: every item must carry exactly the
    * same number of ratings R (the Fleiss 1971 precondition) — a ragged
    * panel fails loudly rather than silently reweighting.
    *
    * {{{
    * P_i  = (Σ_c n_ic² − R) / (R(R−1))
    * P̄   = Σ_i P_i / N
    * p_c  = Σ_i n_ic / (N·R)
    * P̄e  = Σ_c p_c²
    * κ    = (P̄ − P̄e) / (1 − P̄e)
    * }}}
    *
    * Shape: one (item, label) count shuffle, one item-keyed partial agg,
    * one |labels|-row category agg — all numerators integers; the two
    * global sums meet in a 1-row broadcast. κ is NULL when P̄e = 1
    * (all raters constant and equal — chance explains everything). */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String): DataFrame = {
    val r = guarded(df, itemCol, raterCol, labelCol)
    val cellCounts = r.groupBy("__item", "__label")
      .agg(count(lit(1)).as("__n_ic"))
    val perItem = cellCounts.groupBy("__item")
      .agg(sum("__n_ic").as("__r"),
        sum(col("__n_ic") * col("__n_ic")).as("__sumsq"))
    // constant-R precondition, checked in-plan (no driver action)
    val rGuard = perItem.agg(min("__r").as("__rmin"), max("__r").as("__rmax"))
      .select(when(col("__rmin") =!= col("__rmax"),
        raise_error(concat(lit("fleissKappa: ragged panel — items carry "),
          col("__rmin"), lit(" to "), col("__rmax"),
          lit(" ratings; Fleiss requires a constant R"))))
        .otherwise(col("__rmax")).as("n_raters"))
    val itemSums = perItem.agg(count(lit(1)).as("n_items"),
      sum("__sumsq").as("__tot_sumsq"))
    val catSums = cellCounts.groupBy("__label")
      .agg(sum("__n_ic").as("__n_c"))
      .agg(sum(col("__n_c") * col("__n_c")).as("__tot_catsq"))
    itemSums.crossJoin(broadcast(rGuard)).crossJoin(broadcast(catSums))
      .select(col("n_items"), col("n_raters"),
        ((col("__tot_sumsq") - col("n_items") * col("n_raters"))
          .cast("double")
          / (col("n_items") * col("n_raters") * (col("n_raters") - 1)))
          .as("p_bar"),
        (col("__tot_catsq").cast("double")
          / ((col("n_items") * col("n_raters"))
            * (col("n_items") * col("n_raters")))).as("p_e"))
      .withColumn("kappa",
        when(col("p_e") === 1.0, lit(null).cast("double"))
          .otherwise((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e"))))
  }
}
