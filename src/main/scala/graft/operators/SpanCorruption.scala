package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style SPAN CORRUPTION example construction [Raffel et al., JMLR
  * 2020, public]: turn each document into a (input, target) seq2seq pair
  * by masking token spans — the input replaces each masked span with a
  * sentinel `<extra_id_k>`, the target lists each sentinel followed by the
  * tokens it hides. The roundtrip invariant (splicing the target's spans
  * back into the input's sentinel positions reproduces the original token
  * stream exactly) is what makes the pair a valid training example, and is
  * spec-pinned.
  *
  * DETERMINISTIC, like every sampling op here: span starts are decided by
  * a content-keyed hash of (doc key, salt, token position) — the sha256
  * prefix arithmetic shared with [[Sampling.hashUnit]], reproducible
  * across runs, partitionings, and in the driver-side spec reference. A
  * position starts a span when its hash ≡ 0 (mod `startMod`); span length
  * is 1 + hash' mod `maxSpanLen`. Consecutive spans never merge: a span in
  * progress suppresses new starts, AND the position immediately after a
  * closed span is a one-token cooldown that cannot start either — so
  * sentinels always alternate with at least one kept token in the input
  * (the same invariant T5 enforces by merging adjacent spans; here the
  * second span simply never opens). The alternation is spec-pinned.
  *
  * Entirely per-row: one `aggregate` higher-order fold over the token
  * array — map-only, scan-fused, no UDF, no shuffle. Documents with no
  * tokens yield an empty input/target and 0 spans. */
object SpanCorruption {

  /** Output: idCol, `input_text`, `target_text`, `n_spans`. Defaults give
    * ≈ 1/startMod span-start rate with spans of 1..maxSpanLen tokens —
    * startMod=6, maxSpanLen=3 masks ≈ 25% of tokens. */
  def corrupt(df: DataFrame, idCol: String, textCol: String,
              salt: String = "span", startMod: Int = 6,
              maxSpanLen: Int = 3): DataFrame = {
    require(startMod >= 2, s"startMod must be >= 2, got $startMod")
    require(maxSpanLen >= 1, s"maxSpanLen must be >= 1, got $maxSpanLen")
    val toks = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val indexed = transform(toks, (w, i) => struct(w.as("w"), i.as("i")))
    def h(pos: Column, tag: String): Column =
      conv(substring(sha2(concat_ws(":",
        col(idCol).cast("string"), lit(salt), lit(tag), pos.cast("string")),
        256), 1, 8), 16, 10).cast("long")
    val init = struct(
      typedLit(Seq.empty[String]).as("inp"),
      typedLit(Seq.empty[String]).as("tgt"),
      lit(0).as("rem"), lit(0).as("k"))
    val folded = aggregate(
      indexed, init,
      (acc, x) => {
        // rem > 0: inside a span; rem == -1: cooldown (the token right
        // after a span closed — kept, and barred from starting a new span
        // so sentinels can never be adjacent); rem == 0: free position.
        val continue = struct(
          acc("inp").as("inp"),
          concat(acc("tgt"), array(x("w"))).as("tgt"),
          when(acc("rem") === 1, lit(-1)).otherwise(acc("rem") - 1).as("rem"),
          acc("k").as("k"))
        val starts = pmod(h(x("i"), "s"), lit(startMod)) === 0
        val spanLen = (pmod(h(x("i"), "l"), lit(maxSpanLen)) + 1).cast("int")
        val sentinel = concat(lit("<extra_id_"), acc("k").cast("string"), lit(">"))
        val open = struct(
          concat(acc("inp"), array(sentinel)).as("inp"),
          concat(acc("tgt"), array(sentinel, x("w"))).as("tgt"),
          when(spanLen === 1, lit(-1)).otherwise(spanLen - 1).as("rem"),
          (acc("k") + 1).as("k"))
        val keep = struct(
          concat(acc("inp"), array(x("w"))).as("inp"),
          acc("tgt").as("tgt"), lit(0).as("rem"), acc("k").as("k"))
        when(acc("rem") > 0, continue)
          .otherwise(when(acc("rem") === -1, keep)
            .otherwise(when(starts, open).otherwise(keep)))
      },
      acc => struct(
        array_join(acc("inp"), " ").as("input_text"),
        array_join(acc("tgt"), " ").as("target_text"),
        acc("k").as("n_spans")))
    df.select(col(idCol), col(textCol))
      .withColumn("__c", folded)
      .select(col(idCol), col("__c.input_text").as("input_text"),
        col("__c.target_text").as("target_text"),
        col("__c.n_spans").as("n_spans"))
  }
}
