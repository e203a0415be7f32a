package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // ---- the assembled one-pass sweep ------------------------------------
  //
  // The per-signal primitives above are the à-la-carte faces; applying the
  // WHOLE Table A1 filter with them costs one explode+shuffle per n (nine
  // at the paper's n=2..10) plus two segment passes. [[signals]] is the
  // production face: one map-only explode per BRANCH builds every (n, pos,
  // gram) triple in the same pass (no per-n shuffles, no doc-keyed window,
  // nothing pinned), counting runs as two shapes — short grams (topNs)
  // keyed by string for the argmax, long grams (dupNs) keyed by
  // xxhash64(n, gram) so the heavy branch shuffles 8-byte keys — lines and
  // paragraphs share one unioned unit pass, and [[keep]] is the
  // paper-bounds conjunction over the resulting row.
  //
  // Semantics differ from the primitives in two deliberate ways, chosen so
  // every output fraction is ONE IEEE division of exact integer sums
  // (bit-identical across engines, no rounding in the gate):
  //  - normalization is TOKEN characters (Σ token lengths; an n-gram's
  //    chars = length of the space-joined gram minus its n−1 separators),
  //    not raw text length — whitespace carries no repetition signal;
  //  - documents with no units/tokens (or fewer than n tokens) report 0.0
  //    rather than being omitted — the sweep is total, so [[keep]] can run
  //    as a plain conjunction; token-count bounds live in the shape rules
  //    ([[graft.functions.Scrub.gopherKeep]]), not here.
  // Top-gram ties break deterministically toward more characters, then the
  // lexicographically last gram (max(struct(c, chars, gram)) — the same
  // total order an ORDER BY c DESC, chars DESC, gram DESC replay picks).

  /** Gopher Table A1 duplicate-fraction bounds. */
  val DefaultTopBounds: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val DefaultDupBounds: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  private def units(text: Column, sep: String): Column =
    filter(transform(split(text, sep), u => trim(u)), u => length(u) > 0)

  /** The full Table A1 signal row per document, in one pass over the
    * corpus: `dup_line_frac`, `dup_line_char_frac`, `dup_para_frac`,
    * `dup_para_char_frac` (Σ(c−1)/Σc over per-unit occurrence counts, in
    * units and characters), `top_{n}gram_char_frac` for n ∈ topNs, and
    * `dup_{n}gram_char_frac` for n ∈ dupNs (positional coverage — each
    * token position counted once, as [[dupNgramCoverage]] does). */
  def signals(df: DataFrame, idCol: String, textCol: String,
              topNs: Seq[Int] = DefaultTopBounds.map(_._1),
              dupNs: Seq[Int] = DefaultDupBounds.map(_._1)): DataFrame = {
    require(topNs.forall(_ >= 1) && dupNs.forall(_ >= 1),
      "n-gram sizes must be >= 1")
    require(topNs.distinct == topNs && dupNs.distinct == dupNs,
      "duplicate n-gram sizes")
    val id = col(idCol)
    val text = col(textCol)

    // ---- line / paragraph duplication: one unioned explode, one
    // (doc, kind, unit)-keyed count, conditional per-doc assembly --------
    val unitRows = df.select(id, explode(units(text, "\n")).as("u"))
      .withColumn("kind", lit("line"))
      .unionByName(df.select(id, explode(units(text, "\n{2,}")).as("u"))
        .withColumn("kind", lit("para")))
    val unitCounts = unitRows.groupBy(id, col("kind"), col("u"))
      .agg(count(lit(1)).as("c"))
      .withColumn("len", length(col("u")).cast("long"))
    val unitAggs = Seq("line", "para").flatMap { k =>
      val in = col("kind") === k
      val dupU = sum(when(in, col("c") - 1L).otherwise(0L))
      val allU = sum(when(in, col("c")).otherwise(0L))
      val dupCh = sum(when(in, (col("c") - 1L) * col("len")).otherwise(0L))
      val allCh = sum(when(in, col("c") * col("len")).otherwise(0L))
      Seq(
        when(allU > 0, dupU.cast("double") / allU.cast("double"))
          .otherwise(0.0).as(s"dup_${k}_frac"),
        when(allCh > 0, dupCh.cast("double") / allCh.cast("double"))
          .otherwise(0.0).as(s"dup_${k}_char_frac"))
    }
    val unitFracs =
      unitCounts.groupBy(idCol).agg(unitAggs.head, unitAggs.tail: _*)

    // ---- n-grams: MAP-ONLY position/gram explodes (the primitives'
    // proven shape — no doc-keyed window, no pinned lead frame; an earlier
    // lead-window + localCheckpoint spelling pinned corpus-sized storage
    // and starved execution memory at the 100x smoke). Each explode
    // materializes ≤ |ns|·tokens structs per ROW — bounded by document
    // length, exactly like topNgramStats/dupNgramCoverage above. --------
    val toked = df.select(id, TextAnalysis.tokens(text).as("__toks"))
    val totals = toked.select(id,
      aggregate(transform(col("__toks"), t => length(t).cast("long")),
        lit(0L), (a, x) => a + x).as("tokchars"))
    // one struct per POSITION (not per position x n): the longest gram is
    // built once and every shorter gram is substring_index'd off it — a
    // cheap forward scan instead of |ns| array slices + joins per position
    val maxAll = (topNs ++ dupNs).max
    val ts = col("__toks")
    val posed = toked.where(size(ts) > 0)
      .select(id, explode(transform(sequence(lit(0), size(ts) - 1), i =>
        struct(i.cast("int").as("pos"),
          concat_ws(" ", slice(ts, i + 1, lit(maxAll))).as("gmax"),
          (size(ts) - i).cast("int").as("avail")))).as("o"))
      .select(id, col("o.pos").as("pos"), col("o.gmax").as("gmax"),
        col("o.avail").as("avail"))
    def occFor(sel: Seq[Int]): DataFrame =
      posed
        .select(id, col("pos"), col("avail"), col("gmax"),
          explode(array(sel.map(lit): _*)).as("n"))
        .where(col("n") <= col("avail"))
        .select(id, col("n"), col("pos"),
          expr("substring_index(gmax, ' ', n)").as("g"))

    // top-n-gram: the gram STRING must survive to the argmax (chars +
    // deterministic tie-break), but topNs are the SHORT grams (2..4) where
    // duplication collapses the key space — strings through this shuffle
    // are affordable. Deterministic argmax via max(struct(c, chars, g)).
    val topAggs = topNs.map(n => max(when(col("n") === n,
        col("m.c") * col("m.chars") / col("tokchars").cast("double")))
      .as(s"top_${n}gram_char_frac"))
    val topFracs =
      if (topNs.isEmpty) null
      else occFor(topNs)
        .groupBy(idCol, "n", "g").agg(count(lit(1)).as("c"))
        .withColumn("chars", (length(col("g")) - (col("n") - 1)).cast("long"))
        .groupBy(idCol, "n")
        .agg(max(struct(col("c"), col("chars"), col("g"))).as("m"))
        .join(totals, idCol)
        .groupBy(idCol).agg(topAggs.head, topAggs.tail: _*)

    // dup-n-gram coverage: positions under any occurrence of a duplicated
    // gram, deduplicated, then token lengths summed — all doc-keyed. The
    // dupNs are the LONG grams (5..10) where almost every gram is unique,
    // so this is the heavy branch: the count key is xxhash64(n, gram) — an
    // 8-byte key projected in the SAME map stage that builds the gram, so
    // the gram text never shuffles (the SubstringDedup discipline;
    // measured: the string-keyed spelling exhausted the aggregation
    // memory at the 100x smoke). A hash collision can only merge two
    // grams WITHIN one document at the same n (the key carries idCol), so
    // with G grams per doc the false-dup probability is ~G²/2⁶⁵ per doc —
    // vanishing, and strictly a false POSITIVE (coverage can only
    // over-count, never miss a real duplicate).
    val dupFracs =
      if (dupNs.isEmpty) null
      else {
        val occ = occFor(dupNs)
          .select(id, col("n"), col("pos"),
            xxhash64(col("n"), col("g")).as("gh"))
        val dupKeys = occ.groupBy(idCol, "n", "gh")
          .agg(count(lit(1)).as("c"))
          .where(col("c") > 1)
          .select(id, col("n"), col("gh"))
        val covered = occ
          .join(dupKeys, Seq(idCol, "n", "gh"))
          .select(id, col("n"),
            explode(sequence(col("pos"), col("pos") + col("n") - 1)).as("p"))
          .distinct()
        val dupAggs = dupNs.map(n => max(when(col("n") === n,
            col("cov") / col("tokchars").cast("double")))
          .as(s"dup_${n}gram_char_frac"))
        val plens = toked.where(size(col("__toks")) > 0)
          .select(id, posexplode(transform(col("__toks"),
            t => length(t).cast("long"))))
          .toDF(idCol, "p", "plen")
        covered
          .join(plens, Seq(idCol, "p"))
          .groupBy(idCol, "n").agg(sum("plen").as("cov"))
          .join(totals, idCol)
          .groupBy(idCol).agg(dupAggs.head, dupAggs.tail: _*)
      }

    // ---- assembly: doc spine, absent signals coalesce to 0.0 -----------
    val spine = df.select(id)
    val joined = Seq(Option(unitFracs), Option(topFracs), Option(dupFracs))
      .flatten.foldLeft(spine)((acc, f) => acc.join(f, Seq(idCol), "left"))
    val sigCols =
      Seq("line", "para").flatMap(k =>
        Seq(s"dup_${k}_frac", s"dup_${k}_char_frac")) ++
        topNs.map(n => s"top_${n}gram_char_frac") ++
        dupNs.map(n => s"dup_${n}gram_char_frac")
    joined.select(id +: sigCols.map(c => coalesce(col(c), lit(0.0)).as(c)): _*)
  }

  /** The Gopher repetition KEEP decision over a [[signals]] row — a plain
    * conjunction of upper bounds (signals are total: empty docs read 0.0
    * and pass; the shape rules' token bounds drop them). Bounds for n
    * values absent from the signals frame would make the filter lie —
    * callers pass bounds matching the `topNs`/`dupNs` they computed. */
  def keep(maxDupLineFrac: Double = 0.30, maxDupParaFrac: Double = 0.30,
           maxDupLineCharFrac: Double = 0.20,
           maxDupParaCharFrac: Double = 0.20,
           topBounds: Seq[(Int, Double)] = DefaultTopBounds,
           dupBounds: Seq[(Int, Double)] = DefaultDupBounds): Column =
    (Seq(
      col("dup_line_frac") <= maxDupLineFrac,
      col("dup_para_frac") <= maxDupParaFrac,
      col("dup_line_char_frac") <= maxDupLineCharFrac,
      col("dup_para_char_frac") <= maxDupParaCharFrac) ++
      topBounds.map { case (n, b) => col(s"top_${n}gram_char_frac") <= b } ++
      dupBounds.map { case (n, b) => col(s"dup_${n}gram_char_frac") <= b })
      .reduce(_ && _)
}
