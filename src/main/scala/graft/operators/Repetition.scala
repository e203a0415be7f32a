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

  /** Per-document most-frequent word BIGRAM and the fraction of the
    * document's characters it accounts for (count × bigram length over total
    * text length) — the Gopher "top n-gram character fraction" signal at
    * n=2. Ties break lexicographically. Documents with fewer than 2 tokens
    * are omitted. */
  def topBigramStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val grams = df
      .select(col(idCol), length(col(textCol)).as("__tlen"), toks.as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col(idCol), col("__tlen"),
        explode(transform(sequence(lit(0), size(col("__toks")) - 2),
          i => concat_ws(" ", slice(col("__toks"), i + 1, lit(2))))).as("__gram"))
    val counted = grams.groupBy(col(idCol), col("__tlen"), col("__gram"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__c").desc, col("__gram"))
    counted.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("__gram").as("top_bigram"),
        col("__c").as("n_occurrences"),
        ((col("__c") * length(col("__gram"))).cast("double") /
          col("__tlen").cast("double")).as("top_bigram_char_frac"))
  }
}
