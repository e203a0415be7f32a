package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sft

/** Pins [[Sft.assembleChat]]: serialization template, token offsets of the
  * loss masks, arrival-order invariance, and the empty-content edge. */
class SftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val turns = Seq(
    (1L, 0L, "system", "be brief"),
    (1L, 1L, "user", "hi there friend"),
    (1L, 2L, "assistant", "hello you")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("hand-computed serialization and mask offsets") {
    val out = Sft.assembleChat(turns, "conv_id", "turn_idx", "role", "content")
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3)   // n_turns
    assert(r.getLong(2) == 13)  // 4 + 5 + 4 template-aligned tokens
    val text = r.getString(3)
    assert(text == "<|system|> be brief <|end|> <|user|> hi there friend " +
      "<|end|> <|assistant|> hello you <|end|>")
    // whitespace-token alignment: the serialized string really has 13 tokens
    assert(text.split("\\s+").length == 13)
    val mask = r.getSeq[org.apache.spark.sql.Row](4)
    assert(mask.map(m => (m.getLong(0), m.getLong(1))) == Seq((10L, 13L)))
    // the masked range is exactly the assistant content + its <|end|>
    assert(text.split("\\s+").slice(10, 13).toSeq ==
      Seq("hello", "you", "<|end|>"))
  }

  test("multiple assistant turns emit one span each, in turn order") {
    val multi = Seq(
      (2L, 0L, "user", "q one"),
      (2L, 1L, "assistant", "a one"),
      (2L, 2L, "user", "q two longer"),
      (2L, 3L, "assistant", "a two")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val r = Sft.assembleChat(multi, "conv_id", "turn_idx", "role", "content")
      .collect().head
    val mask = r.getSeq[org.apache.spark.sql.Row](4)
      .map(m => (m.getLong(0), m.getLong(1)))
    // turn sizes: 4, 4, 5, 4 → assistant offsets 4 and 13
    assert(mask == Seq((5L, 8L), (14L, 17L)))
    val toks = r.getString(3).split("\\s+")
    assert(toks.slice(5, 8).toSeq == Seq("a", "one", "<|end|>"))
    assert(toks.slice(14, 17).toSeq == Seq("a", "two", "<|end|>"))
  }

  test("arrival order and partitioning never change the result") {
    val shuffled = turns.orderBy(col("turn_idx").desc).repartition(7)
    val a = Sft.assembleChat(turns, "conv_id", "turn_idx", "role", "content")
      .collect().head
    val b = Sft.assembleChat(shuffled, "conv_id", "turn_idx", "role", "content")
      .collect().head
    assert(a.getString(3) == b.getString(3))
    assert(a.getSeq[org.apache.spark.sql.Row](4) ==
      b.getSeq[org.apache.spark.sql.Row](4))
  }

  test("empty assistant content still masks its <|end|> token") {
    val edge = Seq((3L, 0L, "user", "hi"), (3L, 1L, "assistant", ""))
      .toDF("conv_id", "turn_idx", "role", "content")
    val r = Sft.assembleChat(edge, "conv_id", "turn_idx", "role", "content")
      .collect().head
    // turn sizes: 3, 2 → assistant header at 3, mask = [4, 5): the <|end|>
    assert(r.getLong(2) == 5)
    val mask = r.getSeq[org.apache.spark.sql.Row](4)
      .map(m => (m.getLong(0), m.getLong(1)))
    assert(mask == Seq((4L, 5L)))
  }
  test("validateChat: every check fires independently, priority picks the first") {
    def validate(rows: Seq[(Long, Long, String, String)]) = {
      val r = Sft.validateChat(
        rows.toDF("conv_id", "turn_idx", "role", "content"),
        "conv_id", "turn_idx", "role", "content").collect().head
      (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        if (r.isNullAt(9)) null else r.getString(9))
    }
    // clean conversation: system, user, assistant
    val ok = validate(Seq((1L, 0L, "system", "be nice"),
      (1L, 1L, "user", "hi"), (1L, 2L, "assistant", "hello")))
    assert(ok == ((true, true, true, true, true, true, true, null)), ok)
    // user-start without system is equally valid
    val ok2 = validate(Seq((1L, 0L, "user", "hi"),
      (1L, 1L, "assistant", "hello")))
    assert(ok2._7 && ok2._8 == null, ok2)
    // index gap outranks the alternation break it causes
    val gap = validate(Seq((1L, 0L, "user", "hi"),
      (1L, 2L, "assistant", "hello")))
    assert(!gap._1 && gap._8 == "idx_gap", gap)
    // unknown role
    val unk = validate(Seq((1L, 0L, "tool", "hi"),
      (1L, 1L, "assistant", "hello")))
    assert(!unk._2 && unk._8 == "unknown_role", unk)
    // assistant-first: bad_start outranks broken_alternation
    val bad = validate(Seq((1L, 0L, "assistant", "hi"),
      (1L, 1L, "user", "yo"), (1L, 2L, "assistant", "hello")))
    assert(!bad._3 && bad._8 == "bad_start", bad)
    // two users in a row
    val alt = validate(Seq((1L, 0L, "user", "hi"),
      (1L, 1L, "user", "again"), (1L, 2L, "assistant", "hello")))
    assert(!alt._4 && alt._8 == "broken_alternation", alt)
    // blank and NULL content both count as empty
    val emp = validate(Seq((1L, 0L, "user", "hi"),
      (1L, 1L, "assistant", "   ")))
    assert(!emp._5 && emp._8 == "empty_content", emp)
    val nul = validate(Seq((1L, 0L, "user", "hi"),
      (1L, 1L, "assistant", null)))
    assert(!nul._5 && nul._8 == "empty_content", nul)
    // ends on a user turn
    val end = validate(Seq((1L, 0L, "user", "hi"),
      (1L, 1L, "assistant", "hello"), (1L, 2L, "user", "thanks")))
    assert(!end._6 && end._8 == "no_assistant_end", end)
    // system-only conversation: alternation is vacuous, the end check fires
    val sys = validate(Seq((1L, 0L, "system", "be nice")))
    assert(sys._4 && !sys._6 && sys._8 == "no_assistant_end", sys)
    // a SECOND system turn mid-conversation breaks alternation
    val sys2 = validate(Seq((1L, 0L, "system", "a"), (1L, 1L, "user", "b"),
      (1L, 2L, "system", "c"), (1L, 3L, "assistant", "d")))
    assert(!sys2._4 && sys2._8 == "broken_alternation", sys2)
    // roles parameter must cover the convention
    intercept[IllegalArgumentException](Sft.validateChat(
      Seq((1L, 0L, "user", "hi")).toDF("conv_id", "turn_idx", "role", "content"),
      "conv_id", "turn_idx", "role", "content", roles = Seq("user")))
  }
}
