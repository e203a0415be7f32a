package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) example construction [Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle", public;
  * also the infilling objective of Fried et al., InCoder 2022]: rewrite a
  * fraction of documents into (prefix, middle, suffix) training examples so
  * an autoregressive model learns to infill — the document is split at two
  * points and re-serialized with the middle MOVED TO THE END
  * (`<fim_pre> prefix <fim_suf> suffix <fim_mid> middle`, the PSM order),
  * which is exactly a left-to-right LM objective on the transformed text.
  * The reference system has no analog (its operators delegate SQL to
  * Postgres); this extends the example-construction tier next to
  * [[SpanCorruption]] (T5 span masking) — FIM is the decoder-only
  * counterpart with one contiguous masked span and no sentinel vocabulary.
  *
  * DETERMINISM — the same content-keyed recipe as every sampling op here
  * ([[Sampling.hashUnit]] sha256-prefix arithmetic): whether a document is
  * transformed at all (`fimRate`) and both split points are pure functions
  * of (doc key, salt), reproducible across runs, partitionings, and
  * engines; the DuckDB oracle replays the identical arithmetic. Token-level
  * splits (the paper's context-level FIM on whitespace tokens): split
  * points a ≤ b are drawn uniformly over token boundaries 0..n via two
  * independent hashes — a = h_a mod (n+1), b = a + h_b mod (n−a+1) — so
  * empty prefix/middle/suffix are all legal, as in the paper.
  *
  * Shape: entirely per-row Column arithmetic over the token array (slice +
  * array_join) — map-only, scan-fused, codegen'd, no UDF, no shuffle, so it
  * holds at 100 TB exactly as far as the scan does. The roundtrip invariant
  * (prefix ++ middle ++ suffix re-concatenates to the original token
  * stream) is spec-pinned AND carried per row as a self-validating flag by
  * the gate entry. */
object Fim {

  /** Per-doc 32-bit hash in [0, 2^32) keyed by (id, salt, tag) — the
    * shared sha256-prefix spelling, DuckDB-replayable. */
  private def h32(id: Column, salt: String, tag: String): Column =
    conv(substring(sha2(concat_ws(":", id.cast("string"), lit(salt),
      lit(tag)), 256), 1, 8), 16, 10).cast("long")

  /** Rewrite each selected document into a PSM FIM example.
    *
    * Output columns: `idCol`, `is_fim` (false = document left in plain
    * autoregressive form, per the paper's mixed objective), `prefix`,
    * `middle`, `suffix` (token-joined strings; empty when the split makes
    * them so, and all three empty with `is_fim = false` for plain docs
    * where only `fim_text` matters), `fim_text` (the serialized training
    * text: PSM order with the three marker tokens for FIM rows, the
    * original token stream for plain rows), `n_tokens`.
    *
    * @param fimFraction fraction of documents transformed (hash-gated per
    *                    doc; the paper trains at 0.5 without degrading
    *                    left-to-right performance) */
  def fimExamples(df: DataFrame, idCol: String, textCol: String,
                  salt: String = "fim", fimFraction: Double = 0.5,
                  preTok: String = "<fim_pre>", sufTok: String = "<fim_suf>",
                  midTok: String = "<fim_mid>"): DataFrame = {
    require(fimFraction >= 0.0 && fimFraction <= 1.0,
      s"fimFraction must be in [0,1], got $fimFraction")
    val id = col(idCol)
    val toks = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val n = size(toks)
    val isFim = Sampling.hashUnit(concat_ws(":", id.cast("string"),
      lit(salt), lit("r"))) < fimFraction
    // a in [0, n]; b in [a, n] — uniform over token boundaries
    val a = (h32(id, salt, "a") % (n.cast("long") + 1L)).cast("int")
    val b = (a.cast("long") + h32(id, salt, "b") % (n.cast("long") - a + 1L))
      .cast("int")
    // slice is 1-based; length-0 slices yield empty arrays
    val preToks = slice(toks, lit(1), a)
    val midToks = slice(toks, a + 1, b - a)
    val sufToks = slice(toks, b + 1, n - b)
    val plain = array_join(toks, " ")
    // serialized at TOKEN level (markers prepended as tokens, one join) so
    // an empty piece never leaves a double separator in the text
    val psm = array_join(concat(
      array(lit(preTok)), preToks, array(lit(sufTok)), sufToks,
      array(lit(midTok)), midToks), " ")
    df.select(id, col(textCol))
      .select(id,
        isFim.as("is_fim"),
        when(isFim, array_join(preToks, " ")).otherwise(lit("")).as("prefix"),
        when(isFim, array_join(midToks, " ")).otherwise(lit("")).as("middle"),
        when(isFim, array_join(sufToks, " ")).otherwise(lit("")).as("suffix"),
        when(isFim, psm).otherwise(plain).as("fim_text"),
        n.cast("long").as("n_tokens"))
  }
}
