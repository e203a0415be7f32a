package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Difference-in-differences (Ashenfelter & Card 1985; the Card & Krueger
  * 1994 design) — the natural-experiment read for pipeline changes that
  * CANNOT be randomized: a crawler policy changed for one source on date
  * T, a tokenizer swap rolled out to one language first. Randomized A/B
  * is the x130/x147 tier; DiD handles the observational case by
  * differencing out both the stable group gap and the common time trend:
  * `DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)`, identified under
  * parallel trends. No reference analog (`operators.py:80`); SURVEY §2c
  * extension, the observational sibling of x140 CUPED.
  */
object Did {

  /** One row: `(n_tpre, n_tpost, n_cpre, n_cpost, diff_treat,
    * diff_control, did, se, t)` — the 2×2 cell means, their within-group
    * post−pre differences, the DiD estimate, and the unequal-variance
    * standard error `√(Σ_cells s²/n)` with `t = did/se` (the standard
    * large-sample read; clustering adjustments are the caller's upgrade
    * path). `treatedCol`/`postCol` are boolean expressions evaluated per
    * row. `se`/`t` NULL when any cell has n < 2 or the variance
    * degenerates; an EMPTY cell fails loudly — a 2×2 design with a
    * missing cell is not a DiD, and silence would read as evidence.
    *
    * Shape: ONE conditional-moments aggregate (12 sums, map-side
    * partials, no shuffle beyond the 1-row fold) — nothing downstream of
    * the scan is corpus-sized. Moment sums exact for integer metrics;
    * means/differences are fixed IEEE expressions; `se` carries the one
    * sqrt (gate pins round6). NULL treatment/period/metric fail loudly. */
  def differenceInDifferences(df: DataFrame, treatedCol: String,
                              postCol: String, valueCol: String)
      : DataFrame = {
    val guard = when(col(treatedCol).isNull || col(postCol).isNull
        || col(valueCol).isNull,
      raise_error(lit(s"differenceInDifferences: NULL $treatedCol/" +
        s"$postCol/$valueCol — drop or impute upstream")))
      .otherwise(col(treatedCol).cast("boolean"))
    val base = df.select(guard.as("__tr"),
      col(postCol).cast("boolean").as("__po"),
      col(valueCol).cast("double").as("__v"))
    def cell(tag: String, tr: Boolean, po: Boolean) = {
      val in = col("__tr") === tr && col("__po") === po
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$tag"),
        sum(when(in, col("__v")).otherwise(0.0)).as(s"__s$tag"),
        sum(when(in, col("__v") * col("__v")).otherwise(0.0))
          .as(s"__q$tag"))
    }
    val aggs = cell("tpre", tr = true, po = false) ++
      cell("tpost", tr = true, po = true) ++
      cell("cpre", tr = false, po = false) ++
      cell("cpost", tr = false, po = true)
    val m = base.agg(aggs.head, aggs.tail: _*)
    // divisions live INSIDE lazy CaseWhen branches (the welchT ANSI
    // discipline): an eagerly-projected s/n would throw DIVIDE_BY_ZERO on
    // an empty cell before the loud designed guard could fire
    def mean(tag: String) =
      when(col(s"n_$tag") >= 1,
        col(s"__s$tag") / col(s"n_$tag").cast("double"))
    def errVar(tag: String) = // s²/n, lazily guarded (ANSI)
      when(col(s"n_$tag") >= 2,
        (col(s"__q$tag") - col(s"__s$tag") * col(s"__s$tag")
          / col(s"n_$tag").cast("double"))
          / (col(s"n_$tag") - 1).cast("double")
          / col(s"n_$tag").cast("double"))
    val tags = Seq("tpre", "tpost", "cpre", "cpost")
    m.select(
        when(tags.map(t => col(s"n_$t").isNull || col(s"n_$t") === 0)
            .reduce(_ || _),
          raise_error(lit("differenceInDifferences: empty 2x2 cell — a " +
            "design with a missing cell is not a DiD")))
          .otherwise(col("n_tpre")).as("n_tpre"),
        col("n_tpost"), col("n_cpre"), col("n_cpost"),
        (mean("tpost") - mean("tpre")).as("diff_treat"),
        (mean("cpost") - mean("cpre")).as("diff_control"),
        ((mean("tpost") - mean("tpre"))
          - (mean("cpost") - mean("cpre"))).as("did"),
        (errVar("tpre") + errVar("tpost") + errVar("cpre")
          + errVar("cpost")).as("__se2")) // NULL-propagating across cells
      .select(col("n_tpre"), col("n_tpost"), col("n_cpre"), col("n_cpost"),
        col("diff_treat"), col("diff_control"), col("did"),
        when(col("__se2").isNull || col("__se2") <= 0.0,
          lit(null).cast("double"))
          .otherwise(sqrt(col("__se2"))).as("se"))
      .withColumn("t",
        when(col("se").isNull, lit(null).cast("double"))
          .otherwise(col("did") / col("se")))
  }
}
