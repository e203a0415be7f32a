package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ConnectedComponents, Dedup}

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side union-find ground truth: node -> min id of its component. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain graph (worst-case diameter) collapses to one component") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.size == 64 && got.values.toSet == Set(0L))
  }

  test("self-loops, duplicate and reversed edges are tolerated") {
    val got = run(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 9L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 9L -> 7L,
      5L -> 5L))
  }

  test("random graphs match union-find at multiple densities and partitionings") {
    val rnd = new scala.util.Random(42)
    for ((n, m) <- Seq((30, 10), (50, 50), (40, 120)); p <- Seq(1, 7)) {
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges)
      val got = ConnectedComponents.components(
          edges.toDF("src", "dst").repartition(p), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"n=$n m=$m p=$p")
    }
  }

  test("componentsOf assigns singleton components to isolated nodes") {
    val nodes = (1L to 8L).toDF("id")
    val edges = Seq((2L, 4L), (4L, 6L)).toDF("a", "b")
    val got = ConnectedComponents.componentsOf(nodes, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 4L -> 2L, 6L -> 2L,
      3L -> 3L, 5L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("keepClusterRepresentatives keeps exactly the min id per cluster plus uniques") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "b"), (4L, "a''"), (5L, "c"))
      .toDF("doc_id", "text")
    // pairs 1~2, 2~4 (transitive: {1,2,4}); 3 and 5 unique
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("id_1", "id_2")
    val kept = Dedup.keepClusterRepresentatives(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("components rejects non-integral id columns loudly") {
    val bad = Seq(("a", "b")).toDF("id_1", "id_2")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.components(bad, "id_1", "id_2")
    }
    assert(e.getMessage.contains("integral id column"), e.getMessage)
  }

  test("keepClusterRepresentatives works with STRING doc ids (no silent no-op)") {
    // Round-6 regression: ids went through cast("long"), which nulls string
    // ids and silently kept every row. The graph now runs on xxhash64(id);
    // the representative is the minimum original id (lexicographic here).
    val docs = Seq(("cc-2024-abc", "a"), ("cc-2024-def", "a'"),
      ("cc-2024-zzz", "b"), ("cc-2023-aaa", "a''"))
      .toDF("doc_id", "text")
    val pairs = Seq(("cc-2024-abc", "cc-2024-def"),
      ("cc-2024-def", "cc-2023-aaa")).toDF("id_1", "id_2")
    val kept = Dedup.keepClusterRepresentatives(docs, "doc_id", pairs)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("cc-2023-aaa", "cc-2024-zzz"),
      "cluster {abc,def,2023-aaa} must collapse to its lexicographic min")
  }

  test("keepClusterRepresentatives bridges MIXED id types (string df, long pairs)") {
    // numeric-string doc ids with the pair list materialized as longs
    // (e.g. reloaded from parquet): both sides hash their STRING form, so
    // "2" and 2L land on the same graph node instead of silently missing
    val docs = Seq(("1", "a"), ("2", "a'"), ("3", "b")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_1", "id_2")
    val kept = Dedup.keepClusterRepresentatives(docs, "doc_id", pairs)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("1", "3"),
      s"long pair (1,2) must collapse string docs 1~2 to the min: $kept")
  }

  test("keepClusterBest keeps the maximal row per cluster under orderCols") {
    val docs = Seq(
      (1L, "a", 0.3), (2L, "a'", 0.9), (4L, "a''", 0.9),
      (3L, "b", 0.1), (5L, "c", 0.7))
      .toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 4L)).toDF("id_1", "id_2")
    // cluster {1,2,4}: best quality 0.9 tie between 2 and 4 -> larger id 4
    val kept = Dedup.keepClusterBest(docs, "doc_id", pairs,
        Seq("quality", "doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(4L, 3L, 5L), s"got $kept")
    // with min-id-equivalent ordering (descending id impossible; use
    // quality ordering that favors doc 1) parity check: unique docs pass
    // through untouched under ANY ordering
    val kept2 = Dedup.keepClusterBest(docs, "doc_id", pairs, Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(4L, 3L, 5L), "max id policy keeps 4")
    intercept[IllegalArgumentException](
      Dedup.keepClusterBest(docs.withColumn("doc_id", col("doc_id").cast("string")),
        "doc_id", pairs, Seq("quality")))
  }
}
