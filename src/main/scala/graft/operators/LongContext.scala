package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long-context evaluation-data synthesis: needle-in-a-haystack probes
  * (the NIAH protocol popularized by Kamradt's 2023 test and used by
  * essentially every long-context model card): pack real corpus documents
  * into fixed-token-capacity haystacks, then splice one known "needle"
  * token at a controlled DEPTH fraction of each haystack — the eval then
  * asks the model to retrieve it, and recall-by-depth maps the usable
  * context window.
  *
  * The haystack containers are [[Packing.packSequences]]'s bins (docs
  * laid end-to-end in id order, cut at `capacity` tokens — the SAME
  * distributed prefix-sum recipe, so haystack membership is
  * partitioning-invariant); assembly per bin is a sorted-collect fold
  * (the x94 discipline — fold order is the id order, never arrival
  * order); the splice is pure array arithmetic on the token list.
  *
  * Scale: one prefix-sum pass (packSequences), one bin-keyed aggregation
  * whose state is the bin's own ~capacity tokens, and a map-only splice —
  * nothing scales beyond the corpus scan; bins are capacity-bounded up to
  * one straddling document (below) so no group outgrows an executor.
  *
  * Determinism: offsets/bins/positions are exact integer arithmetic; the
  * depth multiply is one fixed IEEE expression — a SQL replay is
  * bit-identical. */
object LongContext {

  /** One row per haystack bin: `bin`, `n_docs`, `n_tokens` (before the
    * needle), `needle_token_pos` (tokens BEFORE the spliced needle =
    * `min(⌊depth·n_tokens⌋, n_tokens)`), and `text` with the needle
    * spliced in. `depth` is evaluated against the output `bin` column
    * (pass e.g. a bin-keyed residue for a deterministic depth sweep);
    * values ≥ 1 clamp to an end-of-haystack needle. `needle` should be a
    * single whitespace-free token so `needle_token_pos` indexes it
    * exactly in the final text.
    *
    * Capacity bound: documents are never split — a document that straddles
    * a capacity boundary belongs entirely to its `bin_first`, so a
    * haystack can EXCEED `capacity` by up to one document's tokens
    * (packSequences' first-fit contract). Probes built for a strict
    * context limit should pre-split oversized documents (chunkDocuments)
    * to the needed granularity before binning; with per-document token
    * counts ≪ capacity the overshoot is proportionally negligible. */
  def needleHaystacks(df: DataFrame, idCol: String, textCol: String,
                      nTokens: Column, capacity: Long, needle: String,
                      depth: Column): DataFrame = {
    require(needle.nonEmpty && !needle.exists(_.isWhitespace),
      "needle must be a single non-empty whitespace-free token")
    val packed = Packing.packSequences(df, idCol, nTokens, capacity)
    val withBin = df.select(col(idCol), col(textCol))
      .join(packed.select(col(idCol), col("bin_first")), Seq(idCol))
    val assembled = withBin.groupBy(col("bin_first").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(
          sort_array(collect_list(struct(col(idCol).as("k"),
            col(textCol).as("t")))),
          x => x.getField("t")), " ").as("__text"))
    assembled
      .withColumn("__tk",
        filter(split(col("__text"), "\\s+"), t => length(t) > 0))
      .withColumn("n_tokens", size(col("__tk")).cast("long"))
      .withColumn("needle_token_pos",
        least(floor(depth * col("n_tokens").cast("double")).cast("long"),
          col("n_tokens")))
      .withColumn("text", array_join(concat(
        slice(col("__tk"), lit(1), col("needle_token_pos").cast("int")),
        array(lit(needle)),
        slice(col("__tk"), (col("needle_token_pos") + 1L).cast("int"),
          (col("n_tokens") - col("needle_token_pos")).cast("int"))), " "))
      .select(col("bin"), col("n_docs"), col("n_tokens"),
        col("needle_token_pos"), col("text"))
  }
}
