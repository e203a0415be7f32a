package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{avg, col, stddev_pop}
import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: nulls, exact distincts, min/max per column in one pass") {
    val df = Seq(
      (Some(1), Some("b")), (Some(2), None), (Some(2), Some("a")),
      (None, Some("a")))
      .toDF("k", "v")
    val out = Profiling.profile(df, Seq("k", "v"))
      .orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("v", 4L, 1L, 2L, "a", "b")))
  }

  test("profileApprox: ≤5% distinct error vs exact, all other fields identical") {
    val orders = graft.sources.Tables.table(spark, TestSpark.sf0001, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate")
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("column_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    val exact = rows(Profiling.profile(orders, cols))
    val approx = rows(Profiling.profileApprox(orders, cols))
    exact.zip(approx).foreach { case ((c, nr, nn, nd, mn, mx), (c2, nr2, nn2, nd2, mn2, mx2)) =>
      assert((c, nr, nn, mn, mx) == (c2, nr2, nn2, mn2, mx2),
        s"$c: non-distinct fields must be identical")
      assert(math.abs(nd2 - nd) <= 0.05 * nd,
        s"$c: approx distinct $nd2 vs exact $nd exceeds 5% relative error")
    }
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profiling.profile(Seq((1, 2)).toDF("a", "b"), Nil)
    }
  }

  test("correlationMatrix: one-scan Gramian path matches the JVM Pearson formula") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val x = rnd.nextDouble() * 10
      val y = 2.0 * x + rnd.nextGaussian() // strong positive
      val z = -x + 3.0 * rnd.nextGaussian() // weak negative
      (x, y, z)
    }
    val df = rows.toDF("x", "y", "z")
    val got = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toMap2
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum / n
      val (sa, sb) = (math.sqrt(a.map(u => (u - ma) * (u - ma)).sum / n),
        math.sqrt(b.map(v => (v - mb) * (v - mb)).sum / n))
      cov / (sa * sb)
    }
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    assert(math.abs(got(("x", "y")) - pearson(xs, ys)) < 1e-9)
    assert(math.abs(got(("x", "z")) - pearson(xs, zs)) < 1e-9)
    assert(math.abs(got(("y", "z")) - pearson(ys, zs)) < 1e-9)
    assert(got(("x", "y")) > 0.9 && got(("x", "z")) < -0.5,
      s"planted correlations must surface: $got")
  }

  test("correlationMatrix: rows with any NULL are excluded; zero variance yields NULL") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(5.0)),
      (None, Some(9.9), Some(9.9))) // excluded listwise
      .toDF("a", "b", "c")
    val out = Profiling.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(out(("a", "b")).get - 1.0) < 1e-12,
      "perfectly linear pair must read exactly 1 after listwise deletion")
    assert(out(("a", "c")).isEmpty && out(("b", "c")).isEmpty,
      "constant column (within complete rows) must yield NULL, not NaN")
  }

  test("correlationMatrix pairwise: per-pair row universes, SQL corr() semantics") {
    // nulls land on DIFFERENT rows per column, so every deletion policy has
    // a distinct row universe per pair
    val df = Seq(
      (Some(1.0), Some(1.0), Some(2.0)),
      (Some(2.0), Some(4.0), None),
      (Some(3.0), Some(3.0), Some(6.0)),
      (None, Some(8.0), Some(7.0)),
      (Some(5.0), None, Some(10.0)))
      .toDF("a", "b", "c")
    val got = Profiling.correlationMatrix(df, Seq("a", "b", "c"),
        deletion = "pairwise")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    def pearson(pairs: Seq[(Double, Double)]): Double = {
      val n = pairs.size.toDouble
      val (ma, mb) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
      val cov = pairs.map { case (u, v) => (u - ma) * (v - mb) }.sum / n
      val sa = math.sqrt(pairs.map(p => (p._1 - ma) * (p._1 - ma)).sum / n)
      val sb = math.sqrt(pairs.map(p => (p._2 - mb) * (p._2 - mb)).sum / n)
      cov / (sa * sb)
    }
    // each pair's universe is exactly the rows where BOTH its columns exist
    assert(math.abs(got(("a", "b")).get -
      pearson(Seq((1.0, 1.0), (2.0, 4.0), (3.0, 3.0)))) < 1e-12)
    assert(math.abs(got(("a", "c")).get -
      pearson(Seq((1.0, 2.0), (3.0, 6.0), (5.0, 10.0)))) < 1e-12)
    assert(math.abs(got(("b", "c")).get -
      pearson(Seq((1.0, 2.0), (3.0, 6.0), (8.0, 7.0)))) < 1e-12)
    assert(math.abs(got(("a", "c")).get - 1.0) < 1e-12,
      "a and c are exactly linear on their shared rows")
    // pairs with < 2 shared rows are NULL, as is a shared-zero-variance pair
    val sparse = Seq(
      (Some(1.0), None, Some(3.0)),
      (None, Some(2.0), Some(3.0)),
      (Some(4.0), Some(5.0), Some(3.0)))
      .toDF("a", "b", "c")
    val g2 = Profiling.correlationMatrix(sparse, Seq("a", "b", "c"),
        deletion = "pairwise")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(g2(("a", "b")).isEmpty, "single shared row → NULL")
    assert(g2(("a", "c")).isEmpty && g2(("b", "c")).isEmpty,
      "constant column on shared rows → NULL")
    intercept[IllegalArgumentException](
      Profiling.correlationMatrix(df, Seq("a", "b"), deletion = "banana"))
  }

  test("standardize: z-scores match JVM moments; null and zero-variance contracts") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Some(2.0), 7.0), (2L, Some(4.0), 7.0),
      (3L, Some(6.0), 7.0), (4L, None, 7.0))
      .toDF("id", "a", "c")
    val out = Profiling.standardize(df, Seq("a", "c"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // complete rows: a = 2,4,6 → μ=4, σ_pop=sqrt(8/3)
    val sd = math.sqrt(8.0 / 3.0)
    assert(math.abs(out(0)._2.get - (2.0 - 4.0) / sd) < 1e-12)
    assert(math.abs(out(1)._2.get - 0.0) < 1e-12)
    assert(math.abs(out(2)._2.get - (6.0 - 4.0) / sd) < 1e-12)
    assert(out(3)._2.isEmpty, "NULL input must yield a NULL z-score")
    assert(out.forall(_._3.isEmpty), "zero-variance column must map to NULL, not ±Inf")
  }

  test("standardize: constant at a NON-representable value still reads zero variance") {
    // 0.1 is not exact in binary: E[x²] − μ² leaves a ±1e-18 residue that
    // would otherwise produce NaN (sqrt of negative) or a ~1e-9 σ turning
    // z-scores into amplified rounding noise. The relative-epsilon clamp
    // must classify it as zero variance → NULL.
    import org.apache.spark.sql.functions.lit
    val df = (1 to 100000).toDF("id")
      .withColumn("c", lit(0.1))
      .withColumn("v", org.apache.spark.sql.functions.col("id").cast("double"))
    val out = Profiling.standardize(df, Seq("c", "v"))
      .select("c_z", "v_z").collect()
    assert(out.forall(_.isNullAt(0)),
      "constant-at-0.1 column must standardize to NULL everywhere")
    assert(out.forall(r => !r.isNullAt(1) && !r.getDouble(1).isNaN),
      "the genuinely varying column must keep real z-scores")
  }

  test("distributionDrift: identical snapshots read zero PSI everywhere") {
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val out = Profiling.distributionDrift(ref, ref, "v", k = 4).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(out.forall(r => r.getLong(1) == 25L && r.getLong(2) == 25L))
    assert(out.forall(r => r.getDouble(3) == 0.25 && r.getDouble(4) == 0.25))
    assert(out.forall(r => r.getDouble(5) == 0.0))
  }

  test("distributionDrift: hand-computed PSI terms, empty-bin eps clamp, NULL exclusion") {
    // ref = 1..10, k=2 → one edge at the exact median 5.5; ref splits 5/5.
    // cur = all values BELOW the edge (plus a NULL that must not count):
    // bucket 1 gets p_cur=1, bucket 2 is EMPTY on the cur side → its term
    // uses the eps clamp: (eps - 0.5)·ln(eps/0.5).
    val ref = (1 to 10).map(i => Some(i.toDouble)).toDF("v")
    val cur = (Seq.fill(4)(Some(2.0)) :+ (None: Option[Double])).toDF("v")
    val out = Profiling.distributionDrift(ref, cur, "v", k = 2).collect()
    val eps = 1e-6
    assert(out.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1, 5L, 4L), (2, 5L, 0L)))
    val t1 = (1.0 - 0.5) * math.log(1.0 / 0.5)
    val t2 = (eps - 0.5) * math.log(eps / 0.5)
    assert(math.abs(out(0).getDouble(5) - t1) < 1e-12)
    assert(math.abs(out(1).getDouble(5) - t2) < 1e-12)
    assert(out(1).getDouble(4) == 0.0, "reported p_cur stays unclamped")
  }

  test("categoricalDrift: value union, one-sided clamp, NULL category exclusion") {
    val ref = (Seq.fill(6)("en") ++ Seq.fill(2)("de") :+ (null: String)).toDF("lang")
    val cur = (Seq.fill(4)("en") ++ Seq.fill(4)("fr")).toDF("lang")
    val out = Profiling.categoricalDrift(ref, cur, "lang").collect()
    // ordered by value: de (ref-only), en, fr (cur-only); NULL row excluded
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("de", 2L, 0L), ("en", 6L, 4L), ("fr", 0L, 4L)))
    val eps = 1e-6
    def term(pc: Double, pr: Double): Double = {
      val (a, b) = (math.max(pc, eps), math.max(pr, eps))
      (a - b) * math.log(a / b)
    }
    val expected = Seq(term(0.0, 0.25), term(0.5, 0.75), term(0.5, 0.0))
    out.map(_.getDouble(5)).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12)
    }
  }

  test("distributionDrift: partitioning invariance and bucket-edge tie rule") {
    val refRows = (1 to 60).map(i => (i % 6).toDouble + 1)
    val curRows = (1 to 30).map(i => (i % 3).toDouble * 2 + 1)
    val a = Profiling.distributionDrift(
      refRows.toDF("v").repartition(1), curRows.toDF("v").repartition(1), "v", k = 3).collect()
    val b = Profiling.distributionDrift(
      refRows.toDF("v").repartition(7), curRows.toDF("v").repartition(5), "v", k = 3).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getLong(1)).sum == 60L && a.map(_.getLong(2)).sum == 30L,
      "every non-NULL row lands in exactly one bucket")
  }

  // --------------------------------------------------------- filterFunnel

  test("filterFunnel: exact per-stage attrition, NULL predicate drops") {
    import org.apache.spark.sql.functions._
    // 6 rows: s1 (v >= 10) passes 4; of those, s2 (tag = 'a') passes 2
    // (row 5's NULL tag must count as a drop); of those, s3 passes 1
    val df = Seq(
      (1L, 20, Some("a")), (2L, 20, Some("a")), (3L, 20, Some("b")),
      (4L, 5, Some("a")), (5L, 20, None), (6L, 3, None))
      .toDF("id", "v", "tag")
    val out = Profiling.filterFunnel(df, Seq(
      "big" -> (col("v") >= 10),
      "tag_a" -> (col("tag") === "a"),
      "id_odd" -> (col("id") % 2 === 1)))
      .orderBy("stage").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1, "big", 6L, 4L, 2L, 4.0 / 6),
      (2, "tag_a", 4L, 2L, 2L, 0.5),
      (3, "id_odd", 2L, 1L, 1L, 0.5)))
  }

  test("filterFunnel scans the input exactly once") {
    import org.apache.spark.sql.functions._
    val df = (1L to 50L).map(i => (i, i * 2)).toDF("id", "v")
    val plan = Profiling.filterFunnel(df, Seq(
      "a" -> (col("v") > 10), "b" -> (col("id") < 40), "c" -> (col("v") % 4 === 0)))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected ONE scan of the input, got $scans:\n$plan")
  }

  test("filterFunnel: empty input yields zero counts and NULL rates") {
    import org.apache.spark.sql.functions._
    val df = Seq.empty[(Long, Int)].toDF("id", "v")
    val out = Profiling.filterFunnel(df, Seq("a" -> (col("v") > 0)))
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 0L && out.head.getLong(3) == 0L
      && out.head.isNullAt(5))
  }

  test("embeddingCentroidDrift: identical sides exact, orthogonal sides zero") {
    val a = Seq((1L, Seq(1.0f, 0.0f, 2.0f)), (2L, Seq(3.0f, 0.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val same = Profiling.embeddingCentroidDrift(a, a, "embedding").head()
    assert(same.getLong(0) == 3L)
    assert(same.getDouble(1) == 1.0 && same.getDouble(2) == 0.0 &&
      same.getDouble(3) == 1.0,
      s"identical sides must read cosine 1, l2 0, ratio 1 EXACTLY: $same")
    // side B lives on the dimension side A never touches → cosine 0
    val b = Seq((3L, Seq(0.0f, 5.0f, 0.0f))).toDF("vec_id", "embedding")
    val orth = Profiling.embeddingCentroidDrift(a, b, "embedding").head()
    assert(orth.getDouble(1) == 0.0, s"orthogonal centroids: $orth")
    // norm ratio = |b| / |a|: centroid a = (2, 0, 3), b = (0, 5, 0)
    assert(math.abs(orth.getDouble(3) - 5.0 / math.sqrt(13.0)) < 1e-3)
  }

  test("tokenizerFertility: hand-computed counts and exact divisions") {
    import spark.implicits._
    // en: "ab cd. x-1" -> words 3; subwords: runs [ab, cd, x, 1] + punct
    // [., -] = 6; chars 10. de: "oo oo" -> words 2, subwords 2, chars 5.
    val df = Seq(("en", "ab cd. x-1"), ("de", "oo oo"))
      .toDF("lang", "text")
    val out = Profiling.tokenizerFertility(df, "lang", "text")
      .orderBy("lang").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(out("en") == ((1L, 3L, 6L, 2.0, 10.0 / 6)))
    assert(out("de") == ((1L, 2L, 2L, 1.0, 2.5)))
  }

  test("tokenizerFertility: zero-word / zero-subword groups report NULL, never NaN") {
    import spark.implicits._
    // 'xx' docs are all whitespace/empty: 0 words AND 0 subwords — both
    // ratios must be NULL (the ngramDiversity degenerate-case convention)
    val df = Seq(("xx", "   "), ("xx", ""), ("en", "a b")).toDF("lang", "text")
    val rows = Profiling.tokenizerFertility(df, "lang", "text")
      .orderBy("lang").collect()
    val en = rows(0); val xx = rows(1)
    assert(en.getString(0) == "en" && en.getDouble(4) == 1.0)
    assert(xx.getString(0) == "xx" && xx.getLong(2) == 0L && xx.getLong(3) == 0L)
    assert(xx.isNullAt(4), "fertility must be NULL for a zero-word group")
    assert(xx.isNullAt(5), "chars_per_subword must be NULL for zero subwords")
  }

  test("bpeishTokenCount equals the RE2-spellable runs+punct formula") {
    import spark.implicits._
    // the x90 oracle counts (maximal alnum runs) + (non-alnum non-space
    // chars) because RE2 has no lookarounds; this property IS the bridge
    val texts = Seq("ab cd. x-1", "a..b", "  ", "", "tab\there\nnew",
      "digits 123x4", "!@# $%", "word", "a b c d", "-lead trail-",
      "mixé café 12.5%")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    import org.apache.spark.sql.functions.{col, expr, length, regexp_replace, size}
    val both = df.select(col("id"),
        graft.functions.TextAnalysis.bpeishTokenCount(col("text")).as("a"),
        (size(expr("regexp_extract_all(text, '[\\\\p{L}\\\\p{N}]+', 0)")) +
          length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", "")))
          .as("b"))
      .collect()
    both.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"text ${texts(r.getLong(0).toInt)}: split=${r.getInt(1)} formula=${r.getInt(2)}"))
  }

  private implicit class MapOps(rows: Array[(String, String, Double)]) {
    def toMap2: Map[(String, String), Double] =
      rows.map { case (a, b, v) => (a, b) -> v }.toMap
  }

  test("truncationLoss: hand-computed per-limit losses from one pass") {
    // group a: docs of 10, 100 tokens; group b: one 5-token doc
    val df = Seq(("a", 10L), ("a", 100L), ("b", 5L)).toDF("g", "nt")
    val out = graft.operators.Profiling
      .truncationLoss(df, "g", col("nt"), Seq(8L, 50L))
      .orderBy("g", "limit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4)))
    // a@8: both over -> lost (10-8)+(100-8)=94, frac 94/110
    // a@50: one over -> lost 50, frac 50/110; b@8/b@50: none over
    assert(out.toSeq == Seq(
      ("a", 8L, 2L, 94L, 94.0 / 110),
      ("a", 50L, 1L, 50L, 50.0 / 110),
      ("b", 8L, 0L, 0L, 0.0),
      ("b", 50L, 0L, 0L, 0.0)))
    // zero-token group reports NULL frac, never NaN
    val z = graft.operators.Profiling
      .truncationLoss(Seq(("z", 0L)).toDF("g", "nt"), "g", col("nt"), Seq(8L))
      .head()
    assert(z.isNullAt(4))
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.truncationLoss(df, "g", col("nt"), Nil)
    }
  }

  test("robustOutliers: hand-computed MAD flags; constant group NULLs; σ would hide the spike") {
    import spark.implicits._
    // group a: values 1..9 plus one 1000 spike.
    // median of {1..9, 1000} = 5.5; deviations {4.5,3.5,...,0.5,0.5,...,994.5}
    // MAD = median(devs) = 2.5; spike z = 994.5/(1.4826*2.5) ≈ 268 — flagged.
    // The classical z-score would NOT flag at 3.5: σ ≈ 297 with the spike in,
    // so spike z_σ ≈ (1000-104.5)/297 ≈ 3.0 — masked by its own inflation.
    val a = ((1 to 9).map(i => ("a", i.toDouble)) :+ ("a", 1000.0))
    val c = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)) // constant: MAD 0
    val df = (a ++ c).toDF("g", "v")
    val out = graft.operators.Profiling.robustOutliers(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4), r.getBoolean(5)))
    val spike = out.find(t => t._1 == "a" && t._2 == 1000.0).get
    assert(math.abs(spike._3 - 994.5 / (1.4826 * 2.5)) < 1e-9)
    assert(spike._4, "the spike must flag")
    assert(out.count(t => t._1 == "a" && t._4) == 1, "only the spike flags")
    // classical z-score comparison: the spike sits ~3.0 sigma — under 3.5
    val stats = df.where(col("g") === "a")
      .agg(avg(col("v")), stddev_pop(col("v"))).head()
    assert((1000.0 - stats.getDouble(0)) / stats.getDouble(1) < 3.5,
      "sigma z-score is masked by the outlier's own variance inflation")
    // constant group: MAD 0 ⇒ NULL z, false flags — never divide-by-epsilon
    val cRows = out.filter(_._1 == "c")
    assert(cRows.length == 3 && cRows.forall(t => t._3.isNaN && !t._4))
  }

  test("robustOutliers: NULL-group rows survive with NULL artifacts and a false flag") {
    import spark.implicits._
    // before the r18 fix the inner join on the group key silently DROPPED
    // NULL-group rows; the documented convention now keeps them — no group
    // means no robust scale, so median/MAD/z are NULL and the flag false —
    // while non-NULL groups are untouched
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0),
      (None, 99.0)).toDF("g", "v")
    val out = graft.operators.Profiling.robustOutliers(df, "g", "v")
    assert(out.count() == 4, "NULL-group rows must not vanish")
    val r = out.where(col("g").isNull).collect()
    assert(r.length == 1)
    val row = r.head
    def i(c: String): Int = row.fieldIndex(c)
    assert(row.isNullAt(i("group_median")) && row.isNullAt(i("group_mad")) &&
      row.isNullAt(i("robust_z")))
    assert(!row.getBoolean(i("is_outlier")))
    // the fitted groups keep their exact medians
    val a = out.where(col("g") === "a").select("group_median").distinct()
      .collect()
    assert(a.length == 1 && a.head.getDouble(0) == 2.0)
  }

  test("spearman: rank-perfect on a monotone nonlinear map where Pearson is not") {
    val df = (1 to 50).map(i => (i.toDouble, (i.toDouble * i * i)))
      .toDF("x", "y")
    val r = graft.operators.Profiling.spearman(df, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Double]("rho") == 1.0)
    val pearson = df.stat.corr("x", "y")
    assert(pearson < 0.95, s"cubic map must not be Pearson-linear: $pearson")
    val rev = graft.operators.Profiling
      .spearman(df.withColumn("y", -col("y")), "x", "y").collect().head
    assert(rev.getAs[Double]("rho") == -1.0)
  }

  test("spearman: hand-computed with a swap and with ties") {
    // x = 1..4, y = 1,3,2,4 → ranks are the values; ρ = 16/20 = 0.8
    val swap = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 4.0))
      .toDF("x", "y")
    val r1 = graft.operators.Profiling.spearman(swap, "x", "y")
      .collect().head
    assert(math.abs(r1.getAs[Double]("rho") - 0.8) < 1e-15)
    // tied pair gets the average rank on both sides → still ρ = 1
    val ties = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("x", "y")
    val r2 = graft.operators.Profiling.spearman(ties, "x", "y")
      .collect().head
    assert(r2.getAs[Double]("rho") == 1.0)
  }

  test("spearman: constant column -> NULL rho; NULL value fails loudly") {
    val const = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "y")
    val r = graft.operators.Profiling.spearman(const, "x", "y")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("rho")))
    val withNull = Seq((Some(1.0), Some(1.0)), (Some(2.0), None))
      .toDF("x", "y")
    val ex = intercept[Exception] {
      graft.operators.Profiling.spearman(withNull, "x", "y").collect()
    }
    assert(ex.getMessage.contains("NULL in y"))
  }

  test("spearman: exactly reproducible across partitionings (rank sums are exact halves)") {
    val rows = (1 to 400).map(i => ((i % 53).toDouble, ((i * 7) % 31).toDouble))
    val a = graft.operators.Profiling
      .spearman(rows.toDF("x", "y"), "x", "y").collect().head.getAs[Double]("rho")
    val b = graft.operators.Profiling
      .spearman(rows.toDF("x", "y").repartition(19), "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(a == b)
  }
}
