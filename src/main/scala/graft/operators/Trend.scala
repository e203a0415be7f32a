package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key monotonic-trend detection: the Mann-Kendall test (Mann 1945;
  * Kendall 1975) with Theil–Sen slope (Theil 1950; Sen 1968, JASA 63) —
  * the robust "is this health series drifting, and how fast?" read that
  * completes the monitoring family: [[ChangePoint.cusum]] localizes WHEN a
  * series left a level; Mann-Kendall asks whether a monotone trend exists
  * at all (rank-based — no linearity or distribution assumption), and
  * Theil–Sen estimates its rate as the MEDIAN of pairwise slopes (robust
  * to ~29% outliers where least squares is wrecked by one bad day). The
  * standard pairing in environmental monitoring, applied here to
  * per-source ingest/quality daily series. No reference analog
  * (`operators.py:80`); SURVEY §2c extension.
  */
object Trend {

  /** One row per key: `(key, n, s, var_s, z, sen_slope)` over the ordered
    * series `(orderCol, valueCol)` within each key — `s = Σ_{i<j}
    * sign(v_j − v_i)` (exact integer), `var_s` the tie-corrected variance
    * `[n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18`, `z` the continuity-corrected
    * normal score ((s∓1)/√var, 0 at s = 0; NULL when var = 0 — all values
    * tied), `sen_slope` the exact median of pairwise slopes
    * `(v_j − v_i)/(o_j − o_i)` (even counts average the two middle order
    * statistics). Keys with fewer than 2 points keep their row with NULL
    * statistics — absent rows hide missing series; NULL key/order/value
    * fail loudly. `orderCol` must be NUMERIC (convert dates to day
    * numbers upstream) and unique per key.
    *
    * Shape: the pair expansion is an equi-self-join on the key — O(len²)
    * per key where len is the SERIES length (days), which the upstream
    * daily aggregate bounds; it never scales with the corpus. At 30-day
    * series that is 435 pairs per key. The median is a per-key
    * row_number window over those bounded pairs. Everything else is one
    * aggregate per frame.
    *
    * Determinism: s and both variance terms are exact integers (var_s is
    * one division by 18); each slope is one IEEE division and the median
    * picks order statistics by integer position (ties in slope value make
    * the picked VALUE unique regardless of row permutation) — z alone
    * carries a sqrt (gate pins round6). */
  /** Per-key sample autocorrelation at the requested lags — the
    * periodicity read next to the trend read: a weekly rhythm in a daily
    * health series shows up as acf(7) ≫ acf(1), and a monitoring alarm
    * that ignores it pages every weekend. One row per (key, lag):
    * `(key, lag, n, acf)` with the standard biased-denominator estimator
    * `acf_k = Σ_{t>k}(x_t − x̄)(x_{t−k} − x̄) / Σ(x_t − x̄)²` (x̄ the
    * full-series mean). NULL when the series is constant (zero
    * denominator) or when n ≤ lag (no pairs). NULL key/order/value fail
    * loudly; orderCol must be unique per key.
    *
    * Shape: ONE window shuffle serves every lag (all LAG columns share
    * the (key, order) spec), then one aggregate per key; the cross-term
    * expands as `Σx_t·x_{t−k} − x̄(Σ_head + Σ_tail) + m·x̄²`, so every
    * sum is exact for integer series and the estimator is a fixed IEEE
    * expression (gate pins round6). */
  def autocorrelation(df: DataFrame, keyCol: String, orderCol: String,
                      valueCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"lags must be positive: $lags")
    val v = when(col(keyCol).isNull || col(orderCol).isNull
        || col(valueCol).isNull,
      raise_error(lit(s"autocorrelation: NULL $keyCol/$orderCol/" +
        s"$valueCol — drop or impute upstream")))
      .otherwise(col(valueCol).cast("double"))
    val withLags = df.select(col(keyCol).as("__k"),
        col(orderCol).as("__o"), v.as("__v"))
      .withColumns(lags.map(k => s"__l$k" ->
        lag(col("__v"), k).over(
          Window.partitionBy("__k").orderBy("__o"))).toMap)
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum("__v").as("__s"),
      sum(col("__v") * col("__v")).as("__q")) ++ lags.flatMap { k =>
      Seq(
        sum(col("__v") * col(s"__l$k")).as(s"__sxy$k"),
        sum(when(col(s"__l$k").isNotNull, col("__v")).otherwise(0.0))
          .as(s"__sh$k"),
        sum(coalesce(col(s"__l$k"), lit(0.0))).as(s"__st$k"),
        sum(when(col(s"__l$k").isNotNull, 1L).otherwise(0L))
          .as(s"__m$k"))
    }
    val m = withLags.groupBy("__k").agg(aggs.head, aggs.tail: _*)
    // ONE projection explodes all lags from the single aggregate row — a
    // per-lag union would re-plan the window + aggregate subtree once per
    // lag (3 Windows, 3 scans in the static plan; the x132 lesson, caught
    // by the PlanQualitySpec pin)
    val xbar = col("__s") / col("n").cast("double")
    val den = col("__q") -
      col("__s") * col("__s") / col("n").cast("double")
    val lagStructs = lags.map { k =>
      val num = col(s"__sxy$k") -
        xbar * (col(s"__sh$k") + col(s"__st$k")) +
        col(s"__m$k").cast("double") * xbar * xbar
      struct(lit(k).as("lag"),
        when(col(s"__m$k") === 0 || den <= 0.0, lit(null).cast("double"))
          .otherwise(num / den).as("acf"))
    }
    m.select(col("__k").as(keyCol), col("n"),
        explode(array(lagStructs: _*)).as("__e"))
      .select(col(keyCol), col("__e.lag").as("lag"), col("n"),
        col("__e.acf").as("acf"))
  }

  def mannKendall(df: DataFrame, keyCol: String, orderCol: String,
                  valueCol: String): DataFrame = {
    val v = when(col(keyCol).isNull || col(orderCol).isNull
        || col(valueCol).isNull,
      raise_error(lit(s"mannKendall: NULL $keyCol/$orderCol/$valueCol — " +
        "drop or impute upstream")))
      .otherwise(col(valueCol).cast("double"))
    val base = df.select(col(keyCol).as("__k"),
      col(orderCol).cast("double").as("__o"), v.as("__v"))
    val perKey = base.groupBy("__k").agg(count(lit(1)).as("n"))
    // tie-group sizes of VALUES within key → Σ t(t−1)(2t+5)
    val tieTerm = base.groupBy("__k", "__v").agg(count(lit(1)).as("__t"))
      .groupBy("__k")
      .agg(sum(col("__t") * (col("__t") - 1) * (col("__t") * 2 + 5))
        .as("__tt"))
    val l = base.select(col("__k"), col("__o").as("__ol"),
      col("__v").as("__vl"))
    val r = base.select(col("__k"), col("__o").as("__or"),
      col("__v").as("__vr"))
    val pairs = l.join(r, Seq("__k")).where(col("__ol") < col("__or"))
      .select(col("__k"),
        signum(col("__vr") - col("__vl")).as("__sgn"),
        ((col("__vr") - col("__vl")) / (col("__or") - col("__ol")))
          .as("__slope"))
    val wSlope = Window.partitionBy("__k").orderBy("__slope")
    val medians = pairs
      .withColumn("__rn", row_number().over(wSlope))
      .withColumn("__np", count(lit(1)).over(Window.partitionBy("__k")))
      .groupBy("__k")
      .agg(sum(col("__sgn")).cast("long").as("s"),
        avg(when(col("__rn") === expr("(__np + 1) div 2")
            || col("__rn") === expr("__np div 2 + 1"), col("__slope")))
          .as("sen_slope"))
    perKey
      // no broadcast hint: tieTerm is bounded by KEY cardinality, which a
      // per-source monitoring deployment can push into the millions —
      // perKey/tieTerm/medians are all already partitioned by __k, so AQE
      // picks broadcast when the frame is actually small and a co-located
      // shuffle join when it is not (driver OOM is not a plan choice)
      .join(tieTerm, Seq("__k"))
      .join(medians, Seq("__k"), "left") // singleton keys: NULL stats
      .select(col("__k").as(keyCol), col("n"), col("s"),
        when(col("n") >= 2,
          (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("__tt"))
            .cast("double") / 18.0).as("var_s"),
        col("sen_slope"))
      .withColumn("z",
        when(col("var_s").isNull || col("var_s") <= 0.0,
          lit(null).cast("double"))
          .otherwise(when(col("s") > 0,
              (col("s") - 1).cast("double") / sqrt(col("var_s")))
            .when(col("s") < 0,
              (col("s") + 1).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0.0))))
      .select(keyCol, "n", "s", "var_s", "z", "sen_slope")
  }
}
