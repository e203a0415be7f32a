package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample tests (Mann & Whitney 1947, Ann. Math. Stat. 18; Kolmogorov
  * 1933 / Smirnov 1939; Welch 1947, Biometrika 34; Fisher 1935) — the
  * source-comparison reads a curation pipeline runs before mixing: "does
  * source A's length / quality / loss distribution differ from source B's,
  * and by how much?" Complements the drift family (x39 PSI needs binning;
  * x76 embedding drift is mean-vector-level): rank-based (MWU: does one
  * source stochastically dominate?), ECDF-based (KS: largest CDF gap and
  * where it sits), parametric (Welch t: mean difference under unequal
  * variances), and assumption-free (randomization test: the permutation
  * null made deterministic by hash). No reference analog (`operators.py:80`
  * delegates to Postgres); SURVEY §2c extensions, siblings of x125
  * Spearman (same distinct-value rank machinery).
  *
  * Shape (MWU/KS): one value-keyed count shuffle collapses the corpus to
  * (value, count_a, count_b) — cardinality-bounded, NOT row-bounded —
  * then a cumulative window over distinct values and a single global
  * aggregate. No row-level global window, no join back to rows: the rank
  * sum Σ count_a(v)·avgrank(v) and the ECDF gap both live entirely on the
  * distinct-value frame. Welch is one conditional-moments pass; the
  * randomization sweep is one explode pass with perms-bounded partials.
  */
object TwoSample {

  private def counts(df: DataFrame, groupCol: String, valueCol: String,
                     groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, s"two-sample groups must differ, got $groupA")
    val g = when(col(groupCol).isNull || col(valueCol).isNull,
        raise_error(lit(s"two-sample: NULL $groupCol/$valueCol — drop or " +
          "impute upstream")))
      .otherwise(col(groupCol))
    df.select(g.as("__g"), col(valueCol).cast("double").as("__v"))
      .filter(col("__g").isin(groupA, groupB))
      .groupBy("__v")
      .agg(sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("__ca"),
           sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("__cb"))
  }

  /** Mann-Whitney U with the normal approximation, tie-corrected: one row
    * `(n_a, n_b, u_a, z)`. `u_a` counts (A, B) pairs where A wins (ties
    * half) — `u_a / (n_a·n_b)` is the common-language effect size;
    * `z = (U_A − n_a·n_b/2) / σ` with the tie-corrected variance
    * `σ² = (n_a·n_b/12)·((n+1) − Σ(t³−t)/(n(n−1)))` over tie-group sizes
    * t. z is NULL when σ = 0 (every value tied — no ordering information),
    * and the test fails loudly when either sample is empty.
    *
    * Determinism: average ranks are exact halves (the [[graft.operators
    * .Profiling.spearman]] discipline), and the rank sum accumulates as
    * DECIMAL(38,0) over the DOUBLED ranks (2·rank is an exact BIGINT), so
    * R_A and U_A are exact at ANY scale — a double fold would reach
    * ~n²/2 ≈ 2⁵³ around n ≈ 1.3·10⁸ and turn fold-order-dependent. The
    * only libm ops are the final sqrt + division — consumers hash-pinning
    * should canonicalize z (the gate pins round6); u_a itself is one
    * correctly-rounded cast of an exact half-integer. */
  def mannWhitneyU(df: DataFrame, groupCol: String, valueCol: String,
                   groupA: String, groupB: String): DataFrame = {
    val c = counts(df, groupCol, valueCol, groupA, groupB)
    // 2·rank of a tie group = 2·(count before it) + (size + 1): exact BIGINT
    val ranked = c.withColumn("__rank2",
      coalesce(sum(col("__ca") + col("__cb")).over(
          Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) * 2 + (col("__ca") + col("__cb") + 1))
    // tie term in exact BIGINT (t³ as a double drifts past 2^53; BIGINT is
    // exact to t ≈ 2.1M per tie group — quantize upstream beyond that)
    val t = col("__ca") + col("__cb")
    val m = ranked.agg(
      sum("__ca").as("n_a"), sum("__cb").as("n_b"),
      // DECIMAL(38,0) accumulator: ca·rank2 ≤ 2n² ≈ 10²⁹ even at n = 10¹⁴
      sum(col("__ca").cast("decimal(38,0)") * col("__rank2")).as("__ra2"),
      sum(t * t * t - t).cast("double").as("__ties"))
    m.select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "mannWhitneyU: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"),
        // U_A = R_A − n_a(n_a+1)/2 = (ra2 − n_a(n_a+1))/2: the subtraction
        // is exact in decimal; one cast + one halving gives the correctly-
        // rounded double regardless of aggregation fold order
        ((col("__ra2") - col("n_a").cast("decimal(38,0)")
          * (col("n_a") + 1).cast("decimal(38,0)")).cast("double") / 2.0)
          .as("u_a"),
        col("__ties"))
      .withColumn("__n", col("n_a") + col("n_b"))
      .withColumn("__var",
        col("n_a").cast("double") * col("n_b").cast("double") / 12.0
          * ((col("__n") + 1).cast("double")
            - col("__ties") / (col("__n").cast("double")
              * (col("__n") - 1).cast("double"))))
      .select(col("n_a"), col("n_b"), col("u_a"),
        when(col("__var") <= 0.0, lit(null).cast("double"))
          .otherwise((col("u_a")
            - col("n_a").cast("double") * col("n_b").cast("double") / 2.0)
            / sqrt(col("__var"))).as("z"))
  }

  /** Welch's unequal-variance t statistic (Welch 1947, Biometrika 34):
    * one row `(n_a, n_b, mean_a, mean_b, t, df)` with the
    * Welch–Satterthwaite degrees of freedom. The parametric
    * mean-difference read next to [[mannWhitneyU]]'s rank read — ONE
    * conditional-moments aggregate pass, map-side partials, no window and
    * no distinct-value frame at all (the lightest test here; use it when
    * the mean is the quantity of interest and outliers are controlled).
    *
    * Determinism: the moment sums are exact for integer-valued metrics;
    * means/variances/t/df are fixed IEEE expression trees spelled
    * identically cross-engine (consumers hash-pinning should canonicalize
    * t and df — the gate pins round6). `t`/`df` are NULL when either
    * sample has n < 2 or both variances are zero (no scale information);
    * empty samples fail loudly. */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, s"two-sample groups must differ, got $groupA")
    val g = when(col(groupCol).isNull || col(valueCol).isNull,
        raise_error(lit(s"two-sample: NULL $groupCol/$valueCol — drop or " +
          "impute upstream")))
      .otherwise(col(groupCol))
    val v = col(valueCol).cast("double")
    def side(grp: String, tag: String) = Seq(
      sum(when(g === grp, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(g === grp, v).otherwise(0.0)).as(s"__s$tag"),
      sum(when(g === grp, v * v).otherwise(0.0)).as(s"__q$tag"))
    val cols = side(groupA, "a") ++ side(groupB, "b")
    val m = df.agg(cols.head, cols.tail: _*)
    // divisions live INSIDE lazy CaseWhen branches: under ANSI mode an
    // eagerly-projected s/(n−1) column would throw DIVIDE_BY_ZERO for
    // n < 2 before any NULL guard could apply
    def mean(tag: String) =
      when(col(s"n_$tag") >= 1,
        col(s"__s$tag") / col(s"n_$tag").cast("double"))
    def errVar(tag: String) = // var/n, the per-side standard-error term
      when(col(s"n_$tag") >= 2,
        (col(s"__q$tag") - col(s"__s$tag") * col(s"__s$tag")
          / col(s"n_$tag").cast("double")) /
          (col(s"n_$tag") - 1).cast("double")
          / col(s"n_$tag").cast("double"))
    m.select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "welchT: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"),
        mean("a").as("mean_a"), mean("b").as("mean_b"),
        errVar("a").as("__ea"), errVar("b").as("__eb"))
      .withColumn("__se2", col("__ea") + col("__eb")) // NULL-propagating
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        when(col("__se2").isNull || col("__se2") <= 0.0,
          lit(null).cast("double"))
          .otherwise((col("mean_a") - col("mean_b")) / sqrt(col("__se2")))
          .as("t"),
        when(col("__se2").isNull || col("__se2") <= 0.0,
          lit(null).cast("double"))
          .otherwise(col("__se2") * col("__se2")
            / (col("__ea") * col("__ea") / (col("n_a") - 1).cast("double")
              + col("__eb") * col("__eb")
                / (col("n_b") - 1).cast("double")))
          .as("df"))
  }

  /** Approximate (randomization) permutation test for the mean difference
    * `mean_A − mean_B` (Fisher 1935; add-one estimator per Phipson & Smyth
    * 2010): one row `(n_a, n_b, obs_diff, n_perms, p_value)`. Each of the
    * `perms` pseudo-permutations reassigns every row to pseudo-A with
    * probability n_a/n by the DETERMINISTIC sha256 unit hash of
    * `id:perm:j` — the Bernoulli approximation to exact label shuffling
    * (group sizes vary binomially around n_a; standard at corpus scale,
    * where hypergeometric vs binomial is negligible). p two-sided:
    * `(1 + #{j : |diff_j| ≥ |obs|}) / (perms + 1)`; a degenerate
    * pseudo-permutation (either side empty — only plausible at toy n)
    * counts as exceeding, the conservative direction.
    *
    * Shape: the observed stat is one conditional-moments pass; the
    * permutation sweep is ONE `explode(sequence(0, perms−1))` pass whose
    * aggregate partials are `perms`-bounded (map-side combine collapses
    * the ×perms row inflation to `perms` rows per partition before the
    * shuffle) and whose final frame is `perms` rows. Work scales as
    * corpus × perms, embarrassingly parallel — bound `perms`, not the
    * corpus.
    *
    * Determinism: the unit hash is the x06d sha256 spelling (exactly
    * replayable in DuckDB); moment sums per pseudo-side are exact for
    * integer metrics, the comparison is identical-IEEE, and p is an exact
    * integer ratio. */
  def permutationTest(df: DataFrame, idCol: String, groupCol: String,
                      valueCol: String, groupA: String, groupB: String,
                      perms: Int): DataFrame = {
    require(perms > 0, s"perms must be positive: $perms")
    val base = df.select(
      when(col(groupCol).isNull || col(valueCol).isNull
          || col(idCol).isNull,
        raise_error(lit(s"two-sample: NULL $idCol/$groupCol/$valueCol — " +
          "drop or impute upstream")))
        .otherwise(col(groupCol)).as("__g"),
      col(idCol).cast("string").as("__id"),
      col(valueCol).cast("double").as("__v"))
      .filter(col("__g").isin(groupA, groupB))
    val obs = base.agg(
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__g") === groupA, col("__v")).otherwise(0.0))
          .as("__sa"),
        sum(when(col("__g") === groupB, col("__v")).otherwise(0.0))
          .as("__sb"))
      .select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "permutationTest: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"),
        (col("__sa") / col("n_a").cast("double")
          - col("__sb") / col("n_b").cast("double")).as("obs_diff"))
    val swept = base.crossJoin(broadcast(obs))
      .withColumn("__j", explode(sequence(lit(0), lit(perms - 1))))
      .withColumn("__u", Sampling.hashUnit(
        concat_ws(":", col("__id"), lit("perm"),
          col("__j").cast("string"))))
      .withColumn("__toA", col("__u")
        < col("n_a").cast("double")
          / (col("n_a") + col("n_b")).cast("double"))
      .groupBy("__j")
      .agg(first("n_a").as("n_a"), first("n_b").as("n_b"),
        first("obs_diff").as("obs_diff"),
        sum(when(col("__toA"), 1L).otherwise(0L)).as("__na"),
        sum(when(col("__toA"), col("__v")).otherwise(0.0)).as("__sa"),
        sum(when(!col("__toA"), 1L).otherwise(0L)).as("__nb"),
        sum(when(!col("__toA"), col("__v")).otherwise(0.0)).as("__sb"))
      .withColumn("__diff",
        when(col("__na") === 0 || col("__nb") === 0,
          lit(null).cast("double"))
          .otherwise(col("__sa") / col("__na").cast("double")
            - col("__sb") / col("__nb").cast("double")))
      // NULL diff (degenerate pseudo-split) counts as exceeding —
      // conservative
      .withColumn("__hit",
        when(col("__diff").isNull, 1L)
          .otherwise(when(abs(col("__diff")) >= abs(col("obs_diff")), 1L)
            .otherwise(0L)))
    swept.groupBy("n_a", "n_b", "obs_diff")
      .agg(count(lit(1)).as("n_perms"), sum("__hit").as("__exceed"))
      .select(col("n_a"), col("n_b"), col("obs_diff"),
        col("n_perms"),
        ((col("__exceed") + 1).cast("double")
          / (col("n_perms") + 1).cast("double")).as("p_value"))
  }

  /** Kruskal-Wallis H (Kruskal & Wallis 1952, JASA 47) — the k-SAMPLE
    * extension of [[mannWhitneyU]]: "do ANY of these sources differ in
    * location?", the one-shot screen before k² pairwise tests. One row
    * `(k, n, h)` over ALL groups in `groupCol`:
    * `H = [(12/(N(N+1)))·Σ_g R_g²/n_g − 3(N+1)] / C` with average-of-ties
    * ranks and the tie correction `C = 1 − Σ(t³−t)/(N³−N)`; compare to
    * χ²(k−1). NULL when C = 0 (every value tied — no ordering
    * information). Groups with NULL names fail loudly; k < 2 fails loudly
    * (no comparison exists).
    *
    * Shape: one (group, value)-keyed count shuffle, a cumulative window
    * over GLOBAL distinct values (cardinality-bounded — the x125
    * machinery), a per-group aggregate of the |groups|·|values|-bounded
    * frame, then a 1-row fold. Rank sums are exact halves; the tie term
    * is exact BIGINT; the final H carries a handful of IEEE ops (round6
    * in the gate). */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    val g = when(col(groupCol).isNull || col(valueCol).isNull,
        raise_error(lit(s"kruskalWallis: NULL $groupCol/$valueCol — drop " +
          "or impute upstream")))
      .otherwise(col(groupCol))
    val cells = df.select(g.as("__g"), col(valueCol).cast("double").as("__v"))
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    // global distinct-value tie counts + average ranks
    val vals = cells.groupBy("__v").agg(sum("__c").as("__t"))
      .withColumn("__rank",
        coalesce(sum("__t").over(Window.orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .cast("double")
          + (col("__t") + 1).cast("double") / 2.0)
    val perGroup = cells.join(vals.select("__v", "__rank"), Seq("__v"))
      .groupBy("__g")
      .agg(sum("__c").as("__ng"),
        sum(col("__c").cast("double") * col("__rank")).as("__rg"))
    val ties = vals.agg(
      sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .cast("double").as("__ties"))
    perGroup
      .agg(countDistinct("__g").as("k"), sum("__ng").as("n"),
        sum(col("__rg") * col("__rg") / col("__ng").cast("double"))
          .as("__sr"))
      .crossJoin(broadcast(ties))
      .select(
        when(col("k").isNull || col("k") < 2, raise_error(lit(
          "kruskalWallis: need at least 2 groups")))
          .otherwise(col("k")).as("k"),
        col("n"),
        {
          // the tie-correction division by N³−N stays inside a lazy
          // branch: with a single row it is 0/0, and the k-guard above
          // must win the race under ANSI eager evaluation
          val nD = col("n").cast("double")
          val h0 = lit(12.0) / (nD * (nD + 1.0)) * col("__sr") -
            lit(3.0) * (nD + 1.0)
          val c = lit(1.0) - col("__ties") / (nD * nD * nD - nD)
          when(col("n") <= 1, lit(null).cast("double"))
            .otherwise(when(c <= 0.0, lit(null).cast("double"))
              .otherwise(h0 / c)).as("h")
        })
  }

  /** Standardized effect sizes (Cliff 1993, Psych. Bull. 114; Cohen 1988;
    * Hedges 1981) — the "HOW different?" companion to the significance
    * tests: at corpus n, everything is significant, and what decides a
    * mixture or filter change is the magnitude. One row `(n_a, n_b,
    * cliffs_delta, cohens_d, hedges_g)`:
    * `δ = 2U_A/(n_a·n_b) − 1` (the rank effect — P(a > b) − P(a < b),
    * ties counting neither side; exactly the [[mannWhitneyU]] U rescaled,
    * so it shares the exact-half rank machinery), `d = (ȳ_a − ȳ_b)/s_p`
    * with the pooled SD, and `g` Hedges' small-sample-corrected d
    * (× `1 − 3/(4n − 9)`). d/g NULL when the pooled variance is zero or
    * n_a + n_b < 3 (a singleton group is fine — its sum of squares is
    * exactly 0); δ is always defined for nonempty groups.
    *
    * Shape: the distinct-value count frame + one cumulative window (for
    * U) and one conditional-moments aggregate (for d) — the same bounded
    * machinery as the tests. Determinism: U and every moment are exact
    * for integer metrics; δ is two exact divisions; d/g carry the
    * sqrt (gate pins round6). */
  def effectSizes(df: DataFrame, groupCol: String, valueCol: String,
                  groupA: String, groupB: String): DataFrame = {
    val c = counts(df, groupCol, valueCol, groupA, groupB)
    // doubled-rank DECIMAL(38,0) accumulation — the mannWhitneyU recipe:
    // exact U at any n, where a double fold drifts past 2^53 at n ≈ 1.3e8
    val ranked = c.withColumn("__rank2",
      coalesce(sum(col("__ca") + col("__cb")).over(
          Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)) * 2 + (col("__ca") + col("__cb") + 1))
    val m = ranked.agg(
      sum("__ca").as("n_a"), sum("__cb").as("n_b"),
      sum(col("__ca").cast("decimal(38,0)") * col("__rank2")).as("__ra2"),
      sum(col("__ca").cast("double") * col("__v")).as("__sa"),
      sum(col("__cb").cast("double") * col("__v")).as("__sb"),
      sum(col("__ca").cast("double") * col("__v") * col("__v"))
        .as("__qa"),
      sum(col("__cb").cast("double") * col("__v") * col("__v"))
        .as("__qb"))
    m.select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "effectSizes: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"), col("__ra2"), col("__sa"), col("__sb"),
        col("__qa"), col("__qb"))
      .withColumn("__u",
        (col("__ra2") - col("n_a").cast("decimal(38,0)")
          * (col("n_a") + 1).cast("decimal(38,0)")).cast("double") / 2.0)
      .withColumn("cliffs_delta",
        lit(2.0) * col("__u")
          / (col("n_a").cast("double") * col("n_b").cast("double"))
          - 1.0)
      .withColumn("__sp2", // pooled variance, lazily guarded (ANSI);
        // a singleton group is fine — its sum of squares is exactly 0
        when(col("n_a") + col("n_b") >= 3,
          ((col("__qa") - col("__sa") * col("__sa")
              / col("n_a").cast("double"))
            + (col("__qb") - col("__sb") * col("__sb")
              / col("n_b").cast("double")))
            / (col("n_a") + col("n_b") - 2).cast("double")))
      .withColumn("cohens_d",
        when(col("__sp2").isNull || col("__sp2") <= 0.0,
          lit(null).cast("double"))
          .otherwise((col("__sa") / col("n_a").cast("double")
            - col("__sb") / col("n_b").cast("double"))
            / sqrt(col("__sp2"))))
      .withColumn("hedges_g",
        col("cohens_d") * (lit(1.0)
          - lit(3.0) / ((col("n_a") + col("n_b")).cast("double") * 4.0
            - 9.0)))
      .select("n_a", "n_b", "cliffs_delta", "cohens_d", "hedges_g")
  }

  /** Two-proportion z-test (the classic pooled-variance form) — the
    * keep-rate comparison a pipeline runs after every filter change: one
    * row `(n_a, n_b, k_a, k_b, p_a, p_b, z)` for a boolean `successCol`.
    * `z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))` with the pooled p̂;
    * NULL when p̂ is 0 or 1 (no variance — both groups unanimous).
    * Counts are exact integers from ONE conditional aggregate (map-side
    * partials, no shuffle beyond the 1-row fold); p's are single exact
    * divisions; z carries the sqrt (gate pins round6). NULL group or
    * success values fail loudly — a NULL "kept?" is a pipeline bug, not
    * a false. */
  def proportionZ(df: DataFrame, groupCol: String, successCol: String,
                  groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, s"two-sample groups must differ, got $groupA")
    val g = when(col(groupCol).isNull || col(successCol).isNull,
        raise_error(lit(s"proportionZ: NULL $groupCol/$successCol — a " +
          "NULL success flag is a pipeline bug, not a false")))
      .otherwise(col(groupCol))
    val s = col(successCol).cast("boolean")
    val m = df.select(g.as("__g"), s.as("__s"))
      .filter(col("__g").isin(groupA, groupB))
      .agg(
        sum(when(col("__g") === groupA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__g") === groupB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__g") === groupA && col("__s"), 1L).otherwise(0L))
          .as("k_a"),
        sum(when(col("__g") === groupB && col("__s"), 1L).otherwise(0L))
          .as("k_b"))
    m.select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "proportionZ: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"), col("k_a"), col("k_b"))
      .withColumn("p_a", col("k_a").cast("double")
        / col("n_a").cast("double"))
      .withColumn("p_b", col("k_b").cast("double")
        / col("n_b").cast("double"))
      .withColumn("__ph", (col("k_a") + col("k_b")).cast("double")
        / (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z",
        when(col("__ph") <= 0.0 || col("__ph") >= 1.0,
          lit(null).cast("double"))
          .otherwise((col("p_a") - col("p_b"))
            / sqrt(col("__ph") * (lit(1.0) - col("__ph"))
              * (lit(1.0) / col("n_a").cast("double")
                + lit(1.0) / col("n_b").cast("double")))))
      .select("n_a", "n_b", "k_a", "k_b", "p_a", "p_b", "z")
  }

  /** Two-sample Kolmogorov-Smirnov statistic: one row
    * `(n_a, n_b, d, ks_at)` — `d = max_v |ECDF_A(v) − ECDF_B(v)|` and
    * `ks_at` the smallest value attaining it (ties on the max break to the
    * leftmost — a deterministic, documented rule). The gap is computed as
    * the INTEGER `|cum_a·n_b − cum_b·n_a|` and divided once at the end, so
    * d is one correctly-rounded division of exact integers — hash-stable
    * with no rounding pin needed. A present-but-empty group fails loudly;
    * a fully empty input yields an empty frame (there is no row to raise
    * from). */
  def ksTest(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String): DataFrame = {
    val c = counts(df, groupCol, valueCol, groupA, groupB)
    val w = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = c.select(col("__v"),
      sum("__ca").over(w).as("__cum_a"), sum("__cb").over(w).as("__cum_b"))
    val tot = c.agg(sum("__ca").as("n_a"), sum("__cb").as("n_b"))
    cum.crossJoin(broadcast(tot))
      .select(col("__v"), col("n_a"), col("n_b"),
        abs(col("__cum_a") * col("n_b") - col("__cum_b") * col("n_a"))
          .as("__gap"))
      .groupBy("n_a", "n_b")
      .agg(max("__gap").as("__d_num"),
           min_by(col("__v"), struct(negate(col("__gap")), col("__v")))
             .as("ks_at"))
      .select(
        when(col("n_a").isNull || col("n_b").isNull
            || col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "ksTest: empty sample — both groups need rows")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"),
        (col("__d_num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")))
          .as("d"),
        col("ks_at"))
  }
}
