package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Always-valid sequential testing — the mixture SPRT (Robbins 1970, Ann.
  * Math. Stat. 41; Johari, Koomen, Pekelis & Walsh, KDD'17 "Peeking at A/B
  * Tests") — the missing temporal face of the TwoSample tier: x130's Welch
  * read is valid at ONE pre-registered look, but a pipeline that monitors
  * an A/B continuously (every ingest day) inflates its false-positive rate
  * with every peek. The mixture-SPRT p-value process is valid at EVERY
  * look simultaneously: reject whenever p_n < α, whenever you happen to
  * look. No reference analog (`operators.py:80`); SURVEY §2c extension,
  * sibling of x143 (which sizes the experiment BEFORE it runs; this one
  * reads it WHILE it runs).
  */
object Sequential {

  /** One row per distinct `orderCol` value (a "look", typically a day):
    * `(ord, n_a, n_b, diff, log_lambda, p_value)` over the CUMULATIVE
    * prefix of the data up to that look —
    * `diff_n = ȳ_A,n − ȳ_B,n`, `V_n = s²_A/n_A + s²_B/n_B`, the normal
    * mixture-SPRT likelihood ratio
    * `Λ_n = √(V_n/(V_n+τ²)) · exp(diff_n²·τ² / (2·V_n·(V_n+τ²)))`
    * (reported as `log_lambda = ln Λ_n` — Λ itself overflows at corpus
    * effect sizes), and the always-valid p-process
    * `p_n = min(1, min_{m≤n} 1/Λ_m)` — a running minimum, so p is
    * monotone non-increasing and `p_n < α` is a valid stopping rule at
    * any look. `tau2` is the mixture variance (the prior scale of the
    * effect you expect to detect — a fixed design constant, like x143's
    * z quantiles). Looks where either side has n < 2 or V_n degenerates
    * carry NULL `log_lambda` (no variance estimate yet); the p-process
    * starts at the first defined look.
    *
    * Shape: ONE per-look conditional aggregate collapses the corpus to a
    * looks-bounded frame (six cumulative moments via one window over the
    * look axis — the x126/x137 daily-aggregate collapse; the look axis is
    * days, never rows), then fixed IEEE arithmetic per look. Moment sums
    * are exact for integer metrics; ln/exp/sqrt are the only libm ops
    * (gate pins round6). */
  def alwaysValidMeanTest(df: DataFrame, groupCol: String, valueCol: String,
                          orderCol: String, groupA: String, groupB: String,
                          tau2: Double): DataFrame = {
    require(groupA != groupB, s"groups must differ, got $groupA")
    require(tau2 > 0.0, s"tau2 must be positive: $tau2")
    val g = when(col(groupCol).isNull || col(valueCol).isNull
        || col(orderCol).isNull,
      raise_error(lit(s"alwaysValidMeanTest: NULL $groupCol/$valueCol/" +
        s"$orderCol — drop or impute upstream")))
      .otherwise(col(groupCol))
    val v = col(valueCol).cast("double")
    val perLook = df
      .select(g.as("__g"), col(orderCol).as("__o"), v.as("__v"))
      .filter(col("__g").isin(groupA, groupB))
      .groupBy("__o")
      .agg(
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__da"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__db"),
        sum(when(col("__g") === groupA, col("__v")).otherwise(0.0))
          .as("__dsa"),
        sum(when(col("__g") === groupB, col("__v")).otherwise(0.0))
          .as("__dsb"),
        sum(when(col("__g") === groupA, col("__v") * col("__v"))
          .otherwise(0.0)).as("__dqa"),
        sum(when(col("__g") === groupB, col("__v") * col("__v"))
          .otherwise(0.0)).as("__dqb"))
    // cumulative moments over the LOOK axis — a looks-bounded single
    // partition (days, not rows; the x126 discipline)
    val wCum = Window.orderBy("__o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLook.select(col("__o"),
      sum("__da").over(wCum).as("n_a"), sum("__db").over(wCum).as("n_b"),
      sum("__dsa").over(wCum).as("__sa"), sum("__dsb").over(wCum).as("__sb"),
      sum("__dqa").over(wCum).as("__qa"), sum("__dqb").over(wCum).as("__qb"))
    def errVar(n: String, s: String, q: String) =
      when(col(n) >= 2,
        (col(q) - col(s) * col(s) / col(n).cast("double"))
          / (col(n) - 1).cast("double") / col(n).cast("double"))
    val stats = cum
      .withColumn("diff",
        when(col("n_a") >= 1 && col("n_b") >= 1,
          col("__sa") / col("n_a").cast("double")
            - col("__sb") / col("n_b").cast("double")))
      .withColumn("__vn",
        errVar("n_a", "__sa", "__qa") + errVar("n_b", "__sb", "__qb"))
      .withColumn("log_lambda",
        when(col("__vn").isNull || col("__vn") <= 0.0,
          lit(null).cast("double"))
          .otherwise(
            lit(0.5) * log(col("__vn") / (col("__vn") + tau2))
              + col("diff") * col("diff") * tau2
                / (lit(2.0) * col("__vn") * (col("__vn") + tau2))))
    // p_n = min(1, exp(−max_{m≤n} logΛ_m)): the running max ignores NULL
    // looks, so the p-process starts at the first defined look
    stats
      .withColumn("__maxll", max("log_lambda").over(wCum))
      .select(col("__o").as("ord"), col("n_a"), col("n_b"), col("diff"),
        col("log_lambda"),
        when(col("__maxll").isNull, lit(null).cast("double"))
          .otherwise(least(lit(1.0), exp(negate(col("__maxll")))))
          .as("p_value"))
  }
}
