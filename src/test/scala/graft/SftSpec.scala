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
}
