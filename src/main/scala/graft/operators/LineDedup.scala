package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the CCNet/RefinedWeb step between
  * whole-document dedup ([[Dedup]]) and duplicated-SPAN removal
  * ([[SubstringDedup]]): a line (nav menu, cookie banner, "subscribe now")
  * that appears in ≥ `minDocFreq` DISTINCT documents is boilerplate and is
  * deleted from EVERY document, preserving the order and separator of what
  * remains.
  *
  * Relational shape, all corpus-sized state distributed:
  *   1. explode to (doc, position, line) — map-only, one row per line;
  *   2. document-frequency per line — a two-level distinct aggregate on the
  *      line text (the only shuffle keyed by line);
  *   3. anti-join lines against the boilerplate set (AQE broadcasts it when
  *      small — it usually is: boilerplate is by definition heavy-tailed);
  *   4. reassemble per document: collect the surviving (position, line)
  *      pairs, sort within the row, join with the separator — order repair
  *      is IN-ROW (`array_sort` of structs), never a window;
  *   5. left-join back to the input ids so a document whose every line was
  *      boilerplate still appears (empty text, full removal count) — rows
  *      are never silently dropped.
  *
  * `sep` is a LITERAL separator (quoted before it reaches Spark's
  * regex-based `split`), matching DuckDB/Python `str.split` semantics.
  * Empty lines (from consecutive/trailing separators) participate in
  * counting like any other line — if `minDocFreq` documents contain empty
  * lines, empty lines are boilerplate and vanish; the spec pins this.
  *
  * Reference scope note: the reference engine (operators.py:80) has no text
  * cleaning; SURVEY.md §2c territory (quality/dedup family).
  */
object LineDedup {

  /** Returns (idCol, text_clean, n_lines, n_removed); every input row
    * appears exactly once. */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             minDocFreq: Int, sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    require(sep.nonEmpty, "sep must be non-empty")
    val litSep = java.util.regex.Pattern.quote(sep)
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), litSep))
        .as(Seq("__pos", "__line")))
    val boiler = lines.groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select("__line")
    val kept = lines.join(boiler, Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy(idCol)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          sep).as("text_clean"),
        count(lit(1)).as("__n_kept"))
    val totals = df.select(col(idCol),
      size(split(col(textCol), litSep)).cast("long").as("n_lines"))
    totals.join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
  }
}
