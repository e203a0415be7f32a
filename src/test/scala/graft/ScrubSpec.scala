package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Scrub

class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Scrub.redactPii(col("t"))).head().getString(0)

  test("redactPii masks urls, emails, IPs and phones; order prevents partial leaks") {
    assert(redact("mail bob.smith+x@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("see https://example.com/a?b=1 and http://x.io") == "see <URL> and <URL>")
    assert(redact("host 192.168.0.17 down") == "host <IP> down")
    assert(redact("call +1 800 555 1234 today") == "call <PHONE> today")
    // a URL containing an email-looking authority must redact as ONE url,
    // not leave a dangling <EMAIL> inside surrounding text
    assert(redact("https://user@example.com/path") == "<URL>")
    assert(redact("plain text stays") == "plain text stays")
  }

  test("redactPii leaves non-matching near-misses alone") {
    assert(redact("version 1.2.3 of lib") == "version 1.2.3 of lib")  // not 4 octets
    assert(redact("at sign @ alone") == "at sign @ alone")
    assert(redact("+1 2 3") == "+1 2 3")                              // wrong phone shape
  }

  test("c4CleanText keeps only terminal-punctuated lines with enough words") {
    val text = "Good first sentence here.\nshort.\nno punctuation line\n" +
      "Another proper sentence!\n   \nEnds with quote.\""
    val out = Seq(text).toDF("t")
      .select(Scrub.c4CleanText(col("t"), minLineWords = 3)).head().getString(0)
    assert(out == "Good first sentence here.\nAnother proper sentence!\nEnds with quote.\"")
  }

  test("c4Keep drops brace pages, lorem ipsum, and too-few-sentence pages") {
    val rows = Seq(
      ("ok", "One fine sentence here.\nA second good one.\nAnd a third line."),
      ("brace", "One fine sentence here.\nA second good one.\nAnd {a} third line."),
      ("lorem", "One fine sentence here.\nA second good one.\nLorem Ipsum filler text."),
      ("thin", "Only one proper sentence.")
    ).toDF("name", "t")
    val kept = rows.where(Scrub.c4Keep(col("t"))).select("name").as[String].collect().toSet
    assert(kept == Set("ok"))
  }

  test("c4Signals fractions are exact single divisions") {
    val text = "Three words here.\nno end\nTiny.\n"
    val r = Seq(text).toDF("t")
      .select(Scrub.c4Signals(col("t")).as("s")).select("s.*").head()
    assert(r.getAs[Int]("n_lines") == 3)
    assert(r.getAs[Double]("frac_terminal") == 2.0 / 3)
    assert(r.getAs[Double]("frac_short") == 2.0 / 3)  // "no end" (2w), "Tiny." (1w)
    assert(!r.getAs[Boolean]("has_brace") && !r.getAs[Boolean]("has_lorem"))
  }

  test("empty and blank documents: zero lines, null fractions, not kept") {
    val r = Seq("", "   \n  ").toDF("t")
      .select(Scrub.c4Signals(col("t")).as("s"), Scrub.c4Keep(col("t")).as("k"))
      .collect()
    r.foreach { row =>
      assert(row.getStruct(0).getAs[Int]("n_lines") == 0)
      assert(row.getStruct(0).isNullAt(1))
      assert(!row.getBoolean(1))
    }
  }

  private def extract(s: String): String =
    Seq(s).toDF("h").select(Scrub.htmlToText(col("h"))).head().getString(0)

  test("htmlToText strips blocks with content, tags, and collapses whitespace") {
    val page = """<html><head><style>p { x: 1 }</style>
      <script>if (1 < 2) { alert("hi") }</script></head>
      <body><!-- note --><h1>Title</h1>
      <p class="a">Hello   world</p></body></html>"""
    assert(extract(page) == "Title Hello world")
  }

  test("htmlToText entity decode: &amp; last, single pass — no double decode") {
    assert(extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g</p>")
      == "a <b> \"c\" 'd' e f & g")
    // double-escaped text must surface the LITERAL entity, never its char
    assert(extract("<p>&amp;lt; &amp;amp;</p>") == "&lt; &amp;")
  }

  test("htmlToText on plain text is whitespace-normalization only") {
    assert(extract("already  clean\n text") == "already clean text")
  }

  private def signalsOf(s: String) =
    Seq(s).toDF("t").select(Scrub.gopherSignals(col("t")).as("s"))
      .select("s.*").head()

  test("gopherSignals: exact counts and fractions on crafted text") {
    val r = signalsOf("The cat sat\n- bullet one\n- bullet two\nwaiting...")
    // tokens: The cat sat - bullet one - bullet two waiting... → 10 tokens
    assert(r.getAs[Long]("n_tokens") == 10L)
    // '...' appears once → symbol ratio 1/10
    assert(r.getAs[Double]("symbol_word_ratio") == 0.1)
    // 4 non-empty lines, 2 bullet-started, 1 ellipsis-ended
    assert(r.getAs[Double]("bullet_line_frac") == 0.5)
    assert(r.getAs[Double]("ellipsis_line_frac") == 0.25)
    // '-' twice contributes non-alpha tokens: 8 of 10 contain [A-Za-z]
    assert(r.getAs[Double]("alpha_token_frac") == 0.8)
    // 'the' (lowercased) present once → 1 hit
    assert(r.getAs[Int]("stopword_hits") == 1)
  }

  test("gopherSignals: empty doc reads zero ratios, NULL mean, and never keeps") {
    val r = signalsOf("   ")
    assert(r.getAs[Long]("n_tokens") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_tok_len")))
    assert(r.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r.getAs[Double]("alpha_token_frac") == 0.0)
    val kept = Seq("   ").toDF("t")
      .select(Scrub.gopherKeep(Scrub.gopherSignals(col("t"))).as("k"))
      .head().getBoolean(0)
    assert(!kept, "NULL mean_tok_len must pin the keep decision to false")
  }

  test("gopherKeep: each rule independently rejects") {
    def keep(s: String, minTokens: Long = 5, minStopwordHits: Int = 0,
             maxEllipsisFrac: Double = 0.3): Boolean =
      Seq(s).toDF("t")
        .select(Scrub.gopherKeep(Scrub.gopherSignals(col("t")),
          minTokens = minTokens, minStopwordHits = minStopwordHits,
          maxEllipsisFrac = maxEllipsisFrac).as("k"))
        .head().getBoolean(0)
    val good = "the quick brown fox jumps over the lazy sleeping dog"
    assert(keep(good))
    assert(!keep("too short"), "token-count floor")
    assert(!keep("### ### " + good), "symbol ratio ceiling")
    assert(!keep("a b c d e f g h i j"), "mean token length floor")
    assert(!keep("the extraordinarily lengthy overcomplicated terminological " +
      "constructions dominate everything", minTokens = 5),
      "mean token length ceiling")
    assert(!keep("12345 67890 12345 67890 12345 67890"), "alpha-token floor")
    assert(!keep(good + "\nwait...", maxEllipsisFrac = 0.3),
      "ellipsis line fraction ceiling")
    assert(!keep("quick brown foxes jump high", minStopwordHits = 2),
      "required-stopword floor")
  }
  test("mojibakeSignals: artifact counts, ratio arithmetic, clean accents score zero") {
    def sig(s: String): (Long, Long, Long, Long, Double) = {
      val r = Seq(s).toDF("t")
        .select(Scrub.mojibakeSignals(col("t")).as("g"))
        .select("g.n_chars", "g.n_2byte", "g.n_3byte", "g.n_replacement",
          "g.artifact_ratio").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
    def corrupt(s: String): String =
      new String(s.getBytes("UTF-8"), "ISO-8859-1")
    // 2-byte artifact: café -> cafÃ© (one lead+continuation pair)
    val c1 = sig(corrupt("café"))
    assert(c1 == ((5L, 1L, 0L, 0L, 2.0 / 5.0)), c1)
    // 3-byte artifact: one CJK char -> three Latin-1 chars, one match
    val c2 = sig(corrupt("中"))
    assert(c2 == ((3L, 0L, 1L, 0L, 3.0 / 3.0)), c2)
    // a REAL é is not a lead byte: clean accented text scores zero
    val clean = sig("café naïve 中文")
    assert(clean._2 == 0L && clean._3 == 0L && clean._5 == 0.0, clean)
    // replacement chars from decode failures are counted, weight 1
    val repl = sig("ab�")
    assert(repl == ((3L, 0L, 0L, 1L, 1.0 / 3.0)), repl)
    // pure ASCII is silent
    assert(sig("plain ascii text")._5 == 0.0)
  }

  test("fixMojibake: exact inverse of the corruption, never touches clean text") {
    def corrupt(s: String): String =
      new String(s.getBytes("UTF-8"), "ISO-8859-1")
    def fix(s: String): String =
      Seq(s).toDF("t").select(Scrub.fixMojibake(col("t"))).head().getString(0)
    val original = "café au lait, naïve 中文 text"
    assert(fix(corrupt(original)) == original, "repair inverts the corruption")
    // clean text — accented or ASCII — passes through untouched
    assert(fix(original) == original)
    assert(fix("plain ascii") == "plain ascii")
    // artifacts next to chars >= U+0100: Latin-1 re-encode would be lossy,
    // so the fixer refuses (fail-honest passthrough)
    val mixed = corrupt("café") + " 中"
    assert(fix(mixed) == mixed, "non-Latin-1 text is never re-encoded")
    // idempotent on its own output here: the repaired text has no artifacts
    assert(fix(fix(corrupt(original))) == original)
  }
}
