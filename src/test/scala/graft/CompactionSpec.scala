package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Contamination, Dedup}

/** Keep-latest compaction ([[Dedup.keepLatest]]), snapshot diff
  * ([[Dedup.snapshotDiff]]) and n-gram novelty
  * ([[Contamination.noveltyFractions]]) — the incremental-corpus audit
  * surface added in round 12. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("crossGroupDupMatrix: hand-computed pair counts, NULL groups dropped") {
    import org.apache.spark.sql.functions.col
    // key k1 in sources a,b,c -> pairs (a,b),(a,c),(b,c)
    // key k2 in a,b (twice in a - distinct set still {a,b}) -> (a,b)
    // key k3 only in a -> no pairs; NULL-source row ignored
    val df = Seq(
      ("k1", "a"), ("k1", "b"), ("k1", "c"),
      ("k2", "a"), ("k2", "a"), ("k2", "b"),
      ("k3", "a")
    ).toDF("k", "src")
      .unionByName(Seq(Tuple1("k1")).toDF("k")
        .withColumn("src", org.apache.spark.sql.functions.lit(null)
          .cast("string")))
    val got = Dedup.crossGroupDupMatrix(df, col("k"), "src")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  // ------------------------------------------------------------ keepLatest

  // (key, ts, seq, payload): user a has three versions incl. a ts tie broken
  // by seq; user b one version; user c two versions in reverse insert order.
  private def versions = Seq(
    ("a", 10, 1L, "a-old"),
    ("a", 20, 2L, "a-mid"),
    ("a", 20, 3L, "a-new"), // ts tie with seq=2 → seq breaks it
    ("b", 5, 4L, "b-only"),
    ("c", 9, 6L, "c-new"),
    ("c", 3, 5L, "c-old"))
    .toDF("user", "ts", "seq", "payload")

  test("keepLatest keeps exactly the lexicographically-maximal version per key") {
    val out = Dedup.keepLatest(versions, Seq("user"), Seq("ts", "seq"))
      .select("user", "payload").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a-new", "b" -> "b-only", "c" -> "c-new"))
  }

  test("keepLatest ties on the first version column fall to the second") {
    // drop seq from the version order and the a-tie would be nondeterministic;
    // with it, seq=3 must win regardless of partitioning
    (1 to 4).foreach { p =>
      val out = Dedup.keepLatest(versions.repartition(p), Seq("user"), Seq("ts", "seq"))
        .where($"user" === "a").select("seq").as[Long].collect()
      assert(out.toSeq == Seq(3L), s"partitions=$p")
    }
  }

  test("keepLatest equals the ROW_NUMBER window spelling") {
    val w = Window.partitionBy("user").orderBy($"ts".desc, $"seq".desc)
    val windowed = versions.withColumn("rn", row_number().over(w))
      .where($"rn" === 1).drop("rn")
      .select("user", "ts", "seq", "payload")
    val agg = Dedup.keepLatest(versions.repartition(5), Seq("user"), Seq("ts", "seq"))
      .select("user", "ts", "seq", "payload")
    assert(agg.collect().toSet == windowed.collect().toSet)
  }

  test("keepLatest supports composite keys and preserves all columns") {
    val df = Seq(("a", 1, 10, "x1"), ("a", 1, 20, "x2"), ("a", 2, 5, "y"))
      .toDF("k1", "k2", "ts", "v")
    val out = Dedup.keepLatest(df, Seq("k1", "k2"), Seq("ts"))
    assert(out.columns.toSeq == Seq("k1", "k2", "ts", "v"))
    assert(out.select("v").as[String].collect().toSet == Set("x2", "y"))
  }

  test("keepLatest plans as ObjectHashAggregate — no sort on either side") {
    val plan = Dedup.keepLatest(versions, Seq("user"), Seq("ts", "seq"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected the typed aggregate:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("WindowExec"),
      s"sort-based plan leaked in:\n$plan")
  }

  test("keepLatest rejects empty key/version lists") {
    intercept[IllegalArgumentException](Dedup.keepLatest(versions, Seq(), Seq("ts")))
    intercept[IllegalArgumentException](Dedup.keepLatest(versions, Seq("user"), Seq()))
  }

  // ---------------------------------------------------------- snapshotDiff

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "same", "en"), (2L, "was", "en"), (3L, "gone", "de"))
      .toDF("id", "text", "lang")
    val neu = Seq((1L, "same", "en"), (2L, "now", "en"), (4L, "fresh", "fr"))
      .toDF("id", "text", "lang")
    val out = Dedup.snapshotDiff(old, neu, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("snapshotDiff compares null-safely: NULL→value is changed, NULL→NULL unchanged") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (3L, Option("v")))
      .toDF("id", "text")
    val neu = Seq((1L, Option("v")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("id", "text")
    val out = Dedup.snapshotDiff(old, neu, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed", 2L -> "unchanged", 3L -> "changed"))
  }

  test("snapshotDiff detects a change in any compare column") {
    val old = Seq((1L, "t", "en")).toDF("id", "text", "lang")
    val neu = Seq((1L, "t", "de")).toDF("id", "text", "lang")
    val out = Dedup.snapshotDiff(old, neu, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed"))
  }

  test("snapshotDiff over disjoint snapshots is total: every id exactly once") {
    val old = (1L to 5L).map(i => (i, s"o$i")).toDF("id", "text")
    val neu = (6L to 8L).map(i => (i, s"n$i")).toDF("id", "text")
    val out = Dedup.snapshotDiff(old.repartition(3), neu.repartition(2), "id", Seq("text"))
      .as[(Long, String)].collect()
    assert(out.length == 8)
    assert(out.toMap == ((1L to 5L).map(_ -> "removed") ++ (6L to 8L).map(_ -> "added")).toMap)
  }

  // ------------------------------------------------------ noveltyFractions

  private def bruteShingles(text: String, k: Int): Set[String] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.length < k) Set(toks.mkString(" "))
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  test("noveltyFractions: exact hand-computed fractions at k=2") {
    val ref = Seq((100L, "x y a b")).toDF("doc_id", "text") // grams: "x y","y a","a b"
    val corpus = Seq(
      (1L, "a b c"),       // grams "a b","b c" → novel "b c" → 1/2
      (2L, "x y a"),       // grams "x y","y a" → 0/2
      (3L, "p q r s"))     // all 3 novel → 3/3
      .toDF("doc_id", "text")
    val out = Contamination.noveltyFractions(corpus, "doc_id", "text", ref, "text", k = 2)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 2L, 1L, 0.5))
    assert(out(2L) == (2L, 2L, 0L, 0.0))
    assert(out(3L) == (3L, 3L, 3L, 1.0))
  }

  test("noveltyFractions: sub-k docs fall back to the whole-text shingle") {
    val ref = Seq((100L, "hello")).toDF("doc_id", "text")
    val corpus = Seq((1L, "hello"), (2L, "goodbye")).toDF("doc_id", "text")
    val out = Contamination.noveltyFractions(corpus, "doc_id", "text", ref, "text", k = 5)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 0.0, 2L -> 1.0))
  }

  test("noveltyFractions matches brute-force string shingles, partitioning-invariant") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc(seed: Int): String =
      (0 until 12).map(i => words((seed * 7 + i * 3) % words.length)).mkString(" ")
    val refRows = (0 until 6).map(i => (100L + i, doc(i)))
    val corpRows = (0 until 10).map(i => (i.toLong, doc(i + 3)))
    val k = 3
    val refSet = refRows.flatMap(r => bruteShingles(r._2, k)).toSet
    val expected = corpRows.map { case (id, text) =>
      val grams = bruteShingles(text, k)
      val novel = grams.count(!refSet.contains(_))
      id -> ((grams.size.toLong, novel.toLong, novel.toDouble / grams.size))
    }.toMap
    Seq(1, 4).foreach { p =>
      val out = Contamination.noveltyFractions(
          corpRows.toDF("doc_id", "text").repartition(p), "doc_id", "text",
          refRows.toDF("doc_id", "text").repartition(p), "text", k)
        .select("doc_id", "n_grams", "n_novel", "novelty")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(out == expected, s"partitions=$p")
    }
  }
}
