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
}
