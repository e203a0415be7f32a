package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Within-document repetition signals — the Gopher-style quality filters
  * (Rae et al. 2021, "Scaling Language Models", table A1) that catch
  * boilerplate-degenerate documents exact/near dedup can't: a page that
  * repeats ITS OWN lines or n-grams is low-quality even if globally unique.
  *
  * Shape: relational explode → groupBy per (doc, unit) → per-doc aggregate —
  * NOT per-row quadratic lambda folds. The shuffle key is (doc_id, unit
  * hash); cardinality is corpus line/bigram count, partial aggregation
  * applies, and no operator is quadratic in document length. At 100 TB this
  * is two narrow shuffles, the same shape as word count.
  */
object Repetition {

  /** Per-document duplicate-SEGMENT fractions (lines, sentences, paragraphs
    * — pick the delimiter):
    *  - `dup_seg_frac`: duplicate segment instances (beyond each segment's
    *    first occurrence) over total segments;
    *  - `dup_seg_char_frac`: characters in those duplicate instances over
    *    total segment characters.
    * Segments are split on `delimRegex`, trimmed, empties dropped. Documents
    * with no non-empty segments are omitted (no segments → no signal). */
  def duplicateSegmentStats(df: DataFrame, idCol: String, textCol: String,
                            delimRegex: String = "\n"): DataFrame = {
    val perSeg = df
      .select(col(idCol), explode(filter(
        transform(split(col(textCol), delimRegex), s => trim(s)),
        s => length(s) > 0)).as("__seg"))
      .groupBy(col(idCol), col("__seg"))
      .agg(count(lit(1)).as("__c"))
      .select(col(idCol), col("__c"), length(col("__seg")).as("__len"))
    perSeg.groupBy(col(idCol))
      .agg(sum("__c").as("__n"),
        count(lit(1)).as("__nd"),
        sum(col("__len") * col("__c")).as("__chars"),
        sum(when(col("__c") > 1, col("__len") * (col("__c") - 1))
          .otherwise(0L)).as("__dchars"))
      .select(col(idCol),
        ((col("__n") - col("__nd")).cast("double") / col("__n"))
          .as("dup_seg_frac"),
        (col("__dchars").cast("double") / col("__chars"))
          .as("dup_seg_char_frac"))
  }

  /** Per-document most-frequent word N-GRAM and the fraction of the
    * document's characters it accounts for (count × n-gram length over total
    * text length) — the Gopher "top n-gram character fraction" signal
    * (n = 2..4 in the paper's table A1). Ties break lexicographically.
    * Documents with fewer than `n` tokens are omitted.
    *
    * Shape: map-only n-gram explode (the token array never survives the
    * explode) → one (doc, gram) count shuffle with partial aggregation →
    * per-doc top-1 window. Never quadratic in document length. */
  def topNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val toks = TextAnalysis.tokens(col(textCol))
    val grams = df
      .select(col(idCol), length(col(textCol)).as("__tlen"), toks.as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col(idCol), col("__tlen"),
        explode(transform(sequence(lit(0), size(col("__toks")) - n),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))).as("__gram"))
    val counted = grams.groupBy(col(idCol), col("__tlen"), col("__gram"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__c").desc, col("__gram"))
    counted.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("__gram").as("top_ngram"),
        col("__c").as("n_occurrences"),
        ((col("__c") * length(col("__gram"))).cast("double") /
          col("__tlen").cast("double")).as("top_ngram_char_frac"))
  }

  /** The n=2 instance under its historical column names (`top_bigram`,
    * `top_bigram_char_frac`). */
  def topBigramStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    topNgramStats(df, idCol, textCol, 2)
      .withColumnRenamed("top_ngram", "top_bigram")
      .withColumnRenamed("top_ngram_char_frac", "top_bigram_char_frac")

  /** Per-document duplicated-n-gram character COVERAGE — the Gopher
    * "fraction of characters contained within duplicate n-grams" signal
    * (n = 5..10 in table A1): the fraction of the document's characters
    * covered by at least one occurrence of a word n-gram that appears more
    * than once in the document, with overlapping occurrences counted ONCE
    * (union over token positions, the published convention).
    *
    * Output: (idCol, dup_chars, total_chars, dup_ngram_char_frac).
    * `dup_chars` sums the lengths of covered TOKENS (inter-token whitespace
    * never counts as covered); `total_chars` is the raw text length — the
    * same denominator as [[topNgramStats]] — so the fraction is conservative.
    * Documents with ≥ n tokens and no duplicated n-gram report 0.0; documents
    * with fewer than n tokens are omitted.
    *
    * Shape: the position/gram/length triples explode map-only (each struct
    * carries its own n token lengths, so nothing re-joins the token array);
    * duplicate marking is one (doc, gram) window; the position union is one
    * distinct; the final fold two per-doc aggregates — all narrow rows, no
    * per-document quadratic step. The pruned (id, text) scan is traversed
    * twice (occurrences + the doc universe for zero-fill) rather than
    * persisting a corpus-sized token-array cache. */
  def dupNgramCoverage(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    val toks = TextAnalysis.tokens(col(textCol))
    val universe = df
      .select(col(idCol), length(col(textCol)).cast("long").as("__tlen"),
        toks.as("__toks"))
      .where(size(col("__toks")) >= n)
    val occ = universe.select(col(idCol), col("__tlen"),
      explode(transform(sequence(lit(0), size(col("__toks")) - n), p =>
        struct(p.as("pos"),
          concat_ws(" ", slice(col("__toks"), p + 1, lit(n))).as("gram"),
          transform(slice(col("__toks"), p + 1, lit(n)), t => length(t))
            .as("lens")))).as("__o"))
    val wc = Window.partitionBy(col(idCol), col("__o.gram"))
    val dup = occ.withColumn("__c", count(lit(1)).over(wc))
      .where(col("__c") > 1)
    val covered = dup
      .select(col(idCol),
        explode(transform(sequence(lit(0), lit(n - 1)), j =>
          struct((col("__o.pos") + j).as("i"),
            element_at(col("__o.lens"), j + 1).as("len")))).as("__cl"))
      .select(col(idCol), col("__cl.i").as("__i"), col("__cl.len").as("__len"))
      .distinct()
      .groupBy(col(idCol)).agg(sum("__len").cast("long").as("__dchars"))
    universe.select(col(idCol), col("__tlen"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__dchars"), lit(0L)).as("dup_chars"),
        col("__tlen").as("total_chars"),
        (coalesce(col("__dchars"), lit(0L)).cast("double") / col("__tlen"))
          .as("dup_ngram_char_frac"))
  }
}
