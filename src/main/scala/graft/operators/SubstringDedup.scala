package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Exact duplicated-substring detection (Lee et al., "Deduplicating Training
  * Data Makes Language Models Better", ACL'22), re-expressed relationally.
  *
  * The paper builds a corpus-wide suffix array and reports every substring of
  * ≥ N tokens that occurs twice anywhere in the corpus; training on text with
  * those spans removed improves LM quality. A literal suffix array is a
  * single-machine artifact — it needs random access to the whole corpus. The
  * relational equivalent that scales on Spark: a span of ≥ k duplicated
  * tokens exists iff every length-k window inside it is duplicated, so
  *
  *   1. explode each document into its token k-gram START POSITIONS, keyed by
  *      the xxhash64 of the gram (8-byte shuffle keys, never gram text —
  *      `exactGrams = true` keys by the literal gram text instead, see below);
  *   2. a `groupBy` count over the gram key finds globally-duplicated grams
  *      (occurrences ≥ minOccurrences) — hash aggregation with MAP-SIDE
  *      PARTIAL aggregation, so a hot gram ("the the the …" boilerplate at
  *      corpus scale) collapses to one row per map task before the shuffle;
  *      a left-semi join of positions against that (much smaller) duplicated
  *      set marks surviving windows, and AQE's skew-join split handles any
  *      residual hot key on the join side. (An earlier spelling used
  *      `count(...).over(Window.partitionBy(gram))`, which gets NO partial
  *      aggregation — every occurrence row of a hot gram lands in a single
  *      WindowExec task — and is exactly the skew this version removes.)
  *   3. per document, merge surviving window starts into maximal spans with
  *      the gaps-and-islands pattern (a window sort bounded by doc length).
  *
  * Total work is O(total tokens) rows through narrow shuffles at any corpus
  * size; contrast the suffix-array build's O(corpus) RAM on one node.
  *
  * Hash-collision bound (default `exactGrams = false`): grouping by the
  * 64-bit xxhash64 of the gram instead of its text means two DIFFERENT grams
  * that collide are counted as one, which can flag a non-duplicated window as
  * duplicated (false positive only — a truly duplicated window can never be
  * missed). By the birthday bound, G distinct grams yield ≈ G²/2⁶⁵ expected
  * colliding pairs: at G ≈ 10¹³ (≈ 100 TB of text) that is ~3·10⁶ pairs, a
  * ~10⁻⁷ fraction of windows — negligible for corpus curation, but not
  * "exact". `exactGrams = true` removes the caveat entirely by shuffling the
  * literal k-token gram string as the key (~k·avg-token bytes per row instead
  * of 8 — the usual ~4–8× wider dedup shuffle); results are then
  * byte-identical to the definition the DuckDB gate oracle replays.
  *
  * Reference scope note: the reference engine (operators.py:80) delegates all
  * transformation to Postgres and has no dedup surface; this extension is
  * SURVEY.md §2c territory.
  */
object SubstringDedup {

  /** Maximal duplicated token spans per document.
    *
    * Output: (idCol, span_start, span_end, n_windows) — token indices,
    * start inclusive, end exclusive; `n_windows` = duplicated k-windows
    * merged into the span. Spans are disjoint per document (consecutive
    * islands are > k apart, so `span_end < next span_start`). Documents
    * shorter than k tokens emit nothing.
    *
    * A span's text occurs elsewhere window-by-window, not necessarily as one
    * contiguous repeat — exactly the paper's "every length-k window of the
    * span is duplicated" criterion (their §4.1 merge step does the same).
    *
    * `exactGrams` selects the duplicate key: `false` (default) shuffles the
    * 8-byte xxhash64 of each gram (a ~10⁻⁷ false-positive window fraction at
    * 100 TB — bound derived in the object scaladoc); `true` shuffles the
    * literal gram text (wider rows, zero collisions).
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 5, minOccurrences: Long = 2L,
                      exactGrams: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minOccurrences >= 2L, s"minOccurrences must be >= 2, got $minOccurrences")
    val toks = TextAnalysis.tokens(col(textCol))
    // one row per window start; by default the gram is hashed at birth so
    // nothing downstream ever shuffles document text
    val gramOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (exactGrams) identity else xxhash64(_)
    val pos = df
      .select(col(idCol), toks.as("__tk"))
      .where(size(col("__tk")) >= k)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - k),
          i => gramOf(concat_ws(" ", slice(col("__tk"), i + 1, lit(k))))))
          .as(Seq("__p", "__g")))
      .select(col(idCol), col("__p").cast("long").as("__p"), col("__g"))
    // duplicated grams via groupBy (map-side partial aggregation collapses
    // hot grams before the shuffle), then a left-semi join marks surviving
    // positions — AQE splits any skewed gram on the join; no postings
    // self-join and therefore no quadratic candidate blowup
    val dupGrams = pos.groupBy("__g")
      .agg(count(lit(1)).as("__occ"))
      .where(col("__occ") >= minOccurrences)
      .select("__g")
    val hits = pos.join(dupGrams, Seq("__g"), "left_semi")
      .select(col(idCol), col("__p"))
    // gaps-and-islands: starts ≤ k apart overlap or touch → same span
    val byDoc = Window.partitionBy(idCol).orderBy("__p")
    hits
      .withColumn("__brk",
        when(col("__p") - lag("__p", 1).over(byDoc) <= k, lit(0L)).otherwise(lit(1L)))
      .withColumn("__island", sum("__brk").over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min("__p").as("span_start"),
        (max("__p") + k).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** The REWRITE the paper actually trains on: rebuild each document with
    * its duplicated spans REMOVED (Lee et al. §4.1 delete the duplicated
    * text before training; [[duplicatedSpans]] only reports it).
    *
    * Two policies:
    *   - `keepFirst = true` (default, the paper's "remove all but one
    *     copy"): a duplicated k-window occurrence is REDUNDANT iff it is
    *     not its gram's globally-first occurrence (min (doc, position) —
    *     deterministic, partitioning-invariant); only tokens covered by a
    *     redundant window are removed, so for non-overlapping copies
    *     exactly one copy of every duplicated stretch survives, in the
    *     earliest document that carries it. SELF-overlapping periodic
    *     repeats ("x x x x x x x x") collapse harder: the redundant
    *     windows overlap the first one, so only its window-free prefix
    *     survives — the right outcome for degenerate boilerplate.
    *   - `keepFirst = false` (the harsher curation stance): every
    *     occurrence of a duplicated window is removed, both copies —
    *     boilerplate is deleted everywhere rather than attributed to a
    *     "first" owner.
    *
    * Output: (idCol, text, n_tokens, removed_tokens) for EVERY input
    * document — `text` is rebuilt by joining the surviving tokens with
    * single spaces (original whitespace runs collapse; the tokenization
    * this pipeline feeds is whitespace-based, so training input is
    * unchanged by that normalization), `n_tokens` the pre-removal count.
    *
    * Shape: the [[duplicatedSpans]] postings pass plus ONE per-gram
    * aggregate carrying (count, min (doc, pos)) — map-side partial, so hot
    * boilerplate grams collapse before the shuffle and the "first
    * occurrence" comes from the same pass as the duplicate test (no
    * per-gram window, no skewed WindowExec task); redundant window starts
    * then merge per document with the same gaps-and-islands window
    * (bounded by doc length), and the rebuild is pure array builtins over
    * a ≤spans-per-doc array joined back to the documents. Nothing wider
    * than 8-byte gram keys crosses the counting shuffle (hash-collision
    * bound in the object scaladoc: over-REMOVAL only, and the gate oracle
    * keys by literal gram text so a collision hash-fails). */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 5, minOccurrences: Long = 2L,
                            keepFirst: Boolean = true,
                            exactGrams: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minOccurrences >= 2L,
      s"minOccurrences must be >= 2, got $minOccurrences")
    val toks = TextAnalysis.tokens(col(textCol))
    val gramOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (exactGrams) identity else xxhash64(_)
    val pos = df
      .select(col(idCol).as("__d"), toks.as("__tk"))
      .where(size(col("__tk")) >= k)
      .select(col("__d"),
        posexplode(transform(sequence(lit(0), size(col("__tk")) - k),
          i => gramOf(concat_ws(" ", slice(col("__tk"), i + 1, lit(k))))))
          .as(Seq("__p", "__g")))
      .select(col("__d"), col("__p").cast("long").as("__p"), col("__g"))
    // ONE pass per gram: duplicate test + first-occurrence pick together
    val gramStats = pos.groupBy("__g")
      .agg(count(lit(1)).as("__occ"),
        min(struct(col("__d"), col("__p"))).as("__first"))
      .where(col("__occ") >= minOccurrences)
    val removable = pos.join(gramStats, Seq("__g"))
      .where(if (keepFirst)
        !(col("__first.__d") === col("__d") && col("__first.__p") === col("__p"))
      else lit(true))
      .select(col("__d"), col("__p"))
    // merge covered window starts into disjoint spans per document
    val byDoc = Window.partitionBy("__d").orderBy("__p")
    val spans = removable
      .withColumn("__brk",
        when(col("__p") - lag("__p", 1).over(byDoc) <= k, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__island", sum("__brk").over(byDoc))
      .groupBy(col("__d"), col("__island"))
      .agg(min("__p").as("s"), (max("__p") + k).as("e"))
      .groupBy(col("__d"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__spans"))
    df.select(col(idCol), toks.as("__tk"))
      .join(spans.withColumnRenamed("__d", idCol), Seq(idCol), "left")
      .select(col(idCol), col("__tk"),
        coalesce(col("__spans"),
          array().cast("array<struct<s:bigint,e:bigint>>")).as("__spans"))
      .select(col(idCol),
        // empty docs guard: sequence(0, -1) DESCENDS in Spark
        when(size(col("__tk")) > 0, filter(
          transform(sequence(lit(0L), size(col("__tk")).cast("long") - 1L),
            i => struct(i.as("i"), element_at(col("__tk"), (i + 1L).cast("int")).as("t"))),
          x => !exists(col("__spans"),
            s => x("i") >= s("s") && x("i") < s("e"))))
          .otherwise(array().cast("array<struct<i:bigint,t:string>>"))
          .as("__keep"),
        size(col("__tk")).cast("long").as("n_tokens"))
      .select(col(idCol),
        array_join(transform(col("__keep"), x => x("t")), " ").as("text"),
        col("n_tokens"),
        (col("n_tokens") - size(col("__keep")).cast("long"))
          .as("removed_tokens"))
  }

  /** Per-document duplicated-token coverage — the statistic the paper uses to
    * size the problem (what fraction of the corpus is duplicated text) and
    * the natural filter input (`dup_fraction > τ` → drop or trim the doc).
    *
    * Output: (idCol, n_tokens, dup_tokens, dup_fraction) for EVERY document
    * (zeros included — a coverage stat over only-affected docs would bias any
    * aggregate built on it). Spans are disjoint, so summing their lengths
    * never double-counts a token.
    */
  def duplicateCoverage(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, minOccurrences: Long = 2L,
                        exactGrams: Boolean = false): DataFrame = {
    val dup = duplicatedSpans(df, idCol, textCol, k, minOccurrences, exactGrams)
      .groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start")).as("dup_tokens"))
    val nTok = df.select(col(idCol),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    nTok.join(dup, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") > 0,
          coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }
}
