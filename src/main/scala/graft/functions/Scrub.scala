package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus scrubbing for training-data pipelines: PII redaction and C4-style
  * boilerplate/quality filtering (Raffel et al. 2020 §2.2's public recipe —
  * line-level punctuation filtering, brace/placeholder-page drops).
  *
  * Everything is a per-row Column expression over builtin functions — a
  * map-only pass, codegen'd, no UDFs, no shuffle. At 100 TB this stage is
  * embarrassingly parallel and runs fused with the scan (filters and
  * projections stay inside one WholeStageCodegen span).
  *
  * Regex notes: patterns are restricted to the syntax subset where Java's
  * engine (Spark) and RE2 (DuckDB oracle) agree — character classes, bounded
  * repetition, `\b`, no backreferences, no lookaround — and are applied in a
  * fixed order (URL → email → IPv4 → phone) since redactions can overlap.
  */
object Scrub {

  val UrlRe   = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-format phone, strict shape: +C[C] SEP ddd SEP ddd SEP dddd
    * (deterministic across engines; no optional groups). */
  val PhoneRe = "\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3}[ -]\\d{4}"

  /** Replace URLs, emails, IPv4 addresses and international phone numbers
    * with typed placeholder tags. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Non-blank lines of a document. */
  def lines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  private def wordsOf(l: Column): Column =
    filter(split(trim(l), "\\s+"), w => length(w) > 0)

  private def terminal(l: Column): Column = {
    val t = trim(l)
    t.endsWith(".") || t.endsWith("!") || t.endsWith("?") || t.endsWith("\"")
  }

  /** C4 line-level cleaning: keep only lines that end in terminal punctuation
    * and carry at least `minLineWords` words; rejoin with '\n'. */
  def c4CleanText(text: Column, minLineWords: Int = 3): Column =
    array_join(
      filter(lines(text),
        l => terminal(l) && size(wordsOf(l)) >= minLineWords),
      "\n")

  /** Document-level C4 keep decision over the CLEANED text: at least
    * `minLines` surviving lines, no curly braces (templated/code pages), no
    * "lorem ipsum" placeholder text. */
  def c4Keep(text: Column, minLineWords: Int = 3, minLines: Int = 3): Column = {
    val cleaned = c4CleanText(text, minLineWords)
    val keptLines = when(cleaned === "", lit(0)).otherwise(size(split(cleaned, "\n")))
    keptLines >= minLines &&
      !text.contains("{") && !text.contains("}") &&
      !lower(text).contains("lorem ipsum")
  }

  // ---- Gopher document-level rules (Rae et al. 2021, table A1) --------

  /** The 8-word required-stopword list of the Gopher document filter: a
    * document must contain at least 2 of these (lowercased token match) to
    * look like running English prose. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Raw signals for the Gopher document-quality rules, as ONE map-only
    * struct (so a pipeline computes them in a single codegen'd projection
    * and the keep decision composes downstream):
    *  - `n_tokens`: whitespace token count;
    *  - `mean_tok_len`: mean token length in chars (NULL when no tokens);
    *  - `symbol_word_ratio`: '#', '…' and '...' occurrences per token —
    *    the hash/ellipsis symbol screen;
    *  - `bullet_line_frac` / `ellipsis_line_frac`: fraction of non-empty
    *    trimmed lines starting with a bullet marker ("- ", "* ", "• ") /
    *    ending in an ellipsis;
    *  - `alpha_token_frac`: fraction of tokens containing at least one
    *    [A-Za-z] character;
    *  - `stopword_hits`: distinct members of [[GopherStopwords]] present.
    * Ratios over zero denominators read 0.0 (and `mean_tok_len` NULL), so
    * an empty document fails the bounds, never NaN-poisons a filter. */
  def gopherSignals(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val nD = n.cast("double")
    def occurrences(s: String): Column =
      (length(text) - length(replace(text, lit(s), lit("")))) / s.length
    val symbols = occurrences("#") + occurrences("…") + occurrences("...")
    val ls = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    val nl = size(ls)
    def lineFrac(p: Column => Column): Column =
      when(nl > 0, size(filter(ls, p)).cast("double") / nl.cast("double"))
        .otherwise(0.0)
    val lowToks = transform(toks, t => lower(t))
    val hits = GopherStopwords
      .map(w => array_contains(lowToks, w).cast("int"))
      .reduce(_ + _)
    struct(
      n.cast("long").as("n_tokens"),
      TextAnalysis.meanTokenLength(text).as("mean_tok_len"),
      when(n > 0, symbols.cast("double") / nD).otherwise(0.0)
        .as("symbol_word_ratio"),
      lineFrac(l => l.startsWith("- ") || l.startsWith("* ")
        || l.startsWith("• ")).as("bullet_line_frac"),
      lineFrac(l => l.endsWith("...") || l.endsWith("…"))
        .as("ellipsis_line_frac"),
      when(n > 0, size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double")
        / nD).otherwise(0.0).as("alpha_token_frac"),
      hits.cast("int").as("stopword_hits"))
  }

  /** The Gopher KEEP decision over a [[gopherSignals]] struct, with the
    * paper's default bounds exposed as parameters (tune per corpus; the
    * published numbers target web crawl at full scale). A NULL
    * `mean_tok_len` (no tokens) fails the bound — comparison semantics
    * make the conjunction NULL, which `coalesce` pins to false so the
    * filter DROPS, never passes, degenerate documents. */
  def gopherKeep(signals: Column,
                 minTokens: Long = 50, maxTokens: Long = 100000,
                 minMeanTok: Double = 3.0, maxMeanTok: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 maxBulletFrac: Double = 0.9, maxEllipsisFrac: Double = 0.3,
                 minAlphaFrac: Double = 0.8,
                 minStopwordHits: Int = 2): Column = coalesce(
    signals("n_tokens").between(minTokens, maxTokens) &&
      signals("mean_tok_len").between(minMeanTok, maxMeanTok) &&
      signals("symbol_word_ratio") <= maxSymbolRatio &&
      signals("bullet_line_frac") <= maxBulletFrac &&
      signals("ellipsis_line_frac") <= maxEllipsisFrac &&
      signals("alpha_token_frac") >= minAlphaFrac &&
      signals("stopword_hits") >= minStopwordHits,
    lit(false))

  // ---- HTML extraction ------------------------------------------------

  /** Script/style/comment BLOCKS go first (content and all), then any
    * remaining tag. `(?s)` (dot matches newline) and non-greedy `.*?` are
    * both in the Java∩RE2 subset; attribute values containing '>' are out
    * of scope for this regex-grade extractor (as they are for every
    * regex-grade extractor — a real parser is the swap-point). */
  val HtmlScriptRe  = "(?s)<script[^>]*>.*?</script>"
  val HtmlStyleRe   = "(?s)<style[^>]*>.*?</style>"
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlTagRe     = "<[^>]+>"

  /** The five named entities decoded after tag removal, `&amp;` LAST — so
    * double-escaped text ("&amp;lt;") decodes to the literal entity
    * ("&lt;"), not to '<'. Each pattern is metacharacter-free, so
    * regexp_replace is a plain global substring replace in both engines. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML → text: the boilerplate-strip that opens every web-crawl
    * pipeline (the regex-grade tier of it — wire a real parser through the
    * same Column signature for pathological markup). Blocks, tags,
    * entities, then whitespace collapse; map-only, codegen'd, fused with
    * the scan like every other Scrub pass. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      HtmlScriptRe, " "), HtmlStyleRe, " "), HtmlCommentRe, " ")
    val noTags = regexp_replace(noBlocks, HtmlTagRe, " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Per-document C4 signals (each fraction is ONE division of exact integer
    * counts — bit-stable across engines): total non-blank lines, fraction of
    * lines ending in terminal punctuation, fraction of lines with fewer than
    * `minLineWords` words, and the brace / lorem-ipsum flags. */
  def c4Signals(text: Column, minLineWords: Int = 3): Column = {
    val ls = lines(text)
    val n = size(ls)
    val nTerm = size(filter(ls, terminal(_)))
    val nShort = size(filter(ls, l => size(wordsOf(l)) < minLineWords))
    struct(
      n.as("n_lines"),
      (nTerm.cast("double") / nullif(n, lit(0)).cast("double")).as("frac_terminal"),
      (nShort.cast("double") / nullif(n, lit(0)).cast("double")).as("frac_short"),
      (text.contains("{") || text.contains("}")).as("has_brace"),
      lower(text).contains("lorem ipsum").as("has_lorem"))
  }

  /** UTF-8-read-as-Latin-1 lead+continuation pairs ("Ã©" where "é" was
    * meant): a 2-byte UTF-8 sequence mis-decoded single-byte becomes a
    * lead char U+00C2–U+00DF followed by a continuation char U+0080–U+00BF.
    * Codepoint classes, identical in Java regex and RE2. */
  val Mojibake2Re = "[\\xC2-\\xDF][\\x80-\\xBF]"
  /** 3-byte leads U+00E0–U+00EF + two continuations ("ä¸­" for "中",
    * "â€™" for "'", "ï»¿" for a BOM). */
  val Mojibake3Re = "[\\xE0-\\xEF][\\x80-\\xBF]{2}"

  /** Encoding-corruption (mojibake) signals — the ftfy-style screen every
    * corpus build runs before quality filtering: text that was UTF-8 on
    * disk but decoded through Latin-1/Windows-1252 somewhere upstream
    * carries unmistakable lead+continuation artifacts ("cafÃ©",
    * "ä¸­æ–‡", "â€œ"), and decode failures leave U+FFFD replacement
    * chars. Struct per row: `n_chars`, `n_2byte` / `n_3byte`
    * (non-overlapping artifact matches, leftmost-first in both engines),
    * `n_replacement`, and `artifact_ratio` — the fraction of characters
    * consumed by artifacts (2·n₂ + 3·n₃ + n_repl) / n_chars, ONE division
    * of exact integers so the flag threshold compares bit-identical
    * doubles cross-engine. Map-only, codegen'd, fused with the scan. */
  def mojibakeSignals(text: Column): Column = {
    val n = length(text)
    val n2 = regexp_count(text, lit(Mojibake2Re))
    val n3 = regexp_count(text, lit(Mojibake3Re))
    val nr = regexp_count(text, lit("\\x{FFFD}"))
    struct(
      n.cast("long").as("n_chars"),
      n2.cast("long").as("n_2byte"),
      n3.cast("long").as("n_3byte"),
      nr.cast("long").as("n_replacement"),
      ((n2 * 2 + n3 * 3 + nr).cast("double")
        / nullif(n, lit(0)).cast("double")).as("artifact_ratio"))
  }

  /** Single-pass mojibake repair: re-encode through Latin-1 and decode the
    * recovered bytes as UTF-8 — the exact inverse of the corruption, so a
    * string that WAS UTF-8-read-as-Latin-1 comes back verbatim. Applied
    * only when (a) artifacts are actually present (clean "café" is never
    * touched — its é is a real é, not a lead byte) and (b) every char is
    * < U+0100 so the Latin-1 re-encode is lossless; anything else passes
    * through unchanged. Bytes that still fail UTF-8 validation decode to
    * U+FFFD (the JVM REPLACE action — deterministic), where they are
    * counted by [[mojibakeSignals]] rather than hidden. Single-pass by
    * design (double-mojibake needs a second application — document, don't
    * guess); map-only like the detector. */
  def fixMojibake(text: Column): Column = {
    val sig = mojibakeSignals(text)
    val hasArtifacts = sig.getField("n_2byte") + sig.getField("n_3byte") > 0L
    val latin1Only = !text.rlike("[^\\x00-\\xFF]")
    when(hasArtifacts && latin1Only,
      decode(encode(text, "ISO-8859-1"), "UTF-8"))
      .otherwise(text)
  }
}
