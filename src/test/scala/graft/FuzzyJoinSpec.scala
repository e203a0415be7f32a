package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Pins for the segment-pigeonhole edit-distance join: completeness against
  * the brute-force cross join (the property the candidate scheme must never
  * lose), short-string and degenerate edge paths, and partitioning
  * invariance. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  test("self-pairs equal brute force on random word-like strings, d = 1..3") {
    val rnd = new scala.util.Random(31)
    val colors = Seq("red", "blue", "green", "teal", "gray", "grey", "pink")
    val nouns = Seq("bolt", "gear", "ring", "widget", "plate")
    val rows = (1L to 120L).map { i =>
      val s = s"${colors(rnd.nextInt(colors.size))} ${nouns(rnd.nextInt(nouns.size))}"
      // sprinkle random single-char mutations for near-miss structure
      val mut = if (rnd.nextBoolean()) s.updated(rnd.nextInt(s.length), 'x') else s
      (i, mut)
    }
    val df = rows.toDF("id", "name").repartition(7)
    for (d <- 1 to 3) {
      val got = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute(rows, d), s"mismatch at d=$d")
    }
  }

  test("short strings (below d+1 chars) take the short bucket and still pair") {
    // probes shorter than d+1 give the pigeonhole no signal — the short
    // bucket must still find their pairs, including the empty string
    val rows = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "abc"),
      (5L, "abcd"), (6L, "zz"))
    val df = rows.toDF("id", "name")
    for (d <- 1 to 3) {
      val got = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute(rows, d), s"mismatch at d=$d")
    }
  }

  test("equal strings pair at dist 0; NULLs never match; d=0 is a hash join") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, null), (4L, "diff"))
      .toDF("id", "name")
    val d1 = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(d1.contains((1L, 2L, 0)))
    assert(!d1.exists(p => p._1 == 3L || p._2 == 3L))
    val d0 = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(d0 == Set((1L, 2L, 0)))
  }

  test("cross form joins two different frames") {
    val left = Seq((10L, "kitten"), (11L, "apple")).toDF("lid", "lname")
    val right = Seq((20L, "sitten"), (21L, "applee"), (22L, "banana"))
      .toDF("rid", "rname")
    val got = FuzzyJoin.editDistancePairs(left, "lid", "lname",
        right, "rid", "rname", 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 20L, 1), (11L, 21L, 1)))
  }

  test("duplicated strings verify once and fan out in id expansion") {
    // 50 copies of each of two near strings: 50×50 cross-pairs + within-
    // group dist-0 pairs must all appear, from ONE verified string pair each
    val rows = (1L to 50L).map(i => (i, "alpha beta")) ++
      (51L to 100L).map(i => (i, "alpha betta"))
    val df = rows.toDF("id", "name").repartition(4)
    val got = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", 1)
    assert(got.count() == brute(rows, 1).size)
  }

  test("partitioning invariance") {
    val rows = (1L to 60L).map(i => (i, s"item ${i % 7} mark ${i % 3}"))
    val a = FuzzyJoin.editDistanceSelfPairs(
        rows.toDF("id", "name").repartition(11), "id", "name", 2)
      .as[(Long, Long, Int)].collect().toSet
    val b = FuzzyJoin.editDistanceSelfPairs(
        rows.toDF("id", "name").coalesce(1), "id", "name", 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b && a == brute(rows, 2))
  }

  test("grouped self-pairs: distinct-string pairs with exact multiplicities") {
    // 3×"red bolt", 2×"red bolts", 1×"blue bolt": grouped output must carry
    // n_id_pairs = count_a × count_b and exclude dist-0 (same-string) pairs
    val rows = Seq.fill(3)("red bolt") ++ Seq.fill(2)("red bolts") ++ Seq("blue bolt")
    val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name").repartition(3)
    val got = FuzzyJoin.editDistanceGroupedSelfPairs(df, "name", 2)
      .as[(String, String, Int, Long)].collect().toSet
    assert(got == Set(("red bolt", "red bolts", 1, 6L)))
    // multiplicities must equal the raw id-pair expansion, cross-name part
    val raw = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", 2)
      .where(col("dist") > 0).count()
    assert(raw == got.map(_._4).sum)
  }

  test("grouped self-pairs: orientation canonicalization never drops a pair") {
    // lengths straddling the short-bucket boundary, descending lexicographic
    // orientation — least/greatest canonicalization must keep the pair
    val df = Seq((1L, "zz"), (2L, "az z"), (3L, "kitten"), (4L, "sitten"))
      .toDF("id", "name")
    val got = FuzzyJoin.editDistanceGroupedSelfPairs(df, "name", 2)
      .as[(String, String, Int, Long)].collect().toSet
    assert(got == Set(("az z", "zz", 2, 1L), ("kitten", "sitten", 1, 1L)))
  }

  test("unicode: multibyte and supplementary (emoji) chars keep brute parity") {
    // segment lengths/positions (length/substr) and the levenshtein kernel
    // must agree on the same character unit — a code-unit/code-point
    // mismatch would silently lose pairs on non-ASCII strings
    val rows = Seq(
      (1L, "héllo wörld"), (2L, "hèllo wörld"), (3L, "héllo wörld!"),
      (4L, "日本語テキスト"), (5L, "日本語テキスト!"), (6L, "日本語テクスト"),
      (7L, "a😀b😀c"), (8L, "a😀b😀d"), (9L, "a😀b😀"), (10L, "züri🎈fest"),
      (11L, "züri🎈feste"))
    val df = rows.toDF("id", "name").repartition(3)
    for (d <- 1 to 2) {
      // brute via Spark's own levenshtein (the unit the operator must match)
      val brute = df.as("a").crossJoin(df.as("b"))
        .where(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          levenshtein(col("a.name"), col("b.name")).as("dist"))
        .where(col("dist") <= d)
        .as[(Long, Long, Int)].collect().toSet
      val got = FuzzyJoin.editDistanceSelfPairs(df, "id", "name", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute, s"unicode mismatch at d=$d: $got vs $brute")
    }
  }

  test("guards: negative maxDist throws") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException](
      FuzzyJoin.editDistanceSelfPairs(df, "id", "name", -1))
  }
}
