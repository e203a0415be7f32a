package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic sampling specs: partitioning-invariance is the property that
  * distinguishes these from `df.sample()` (whose output moves when the input
  * is repartitioned). */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs =
    graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")

  test("bernoulliByKey: deterministic, partitioning-invariant, ~fraction-sized") {
    val n = docs.count()
    val s1 = Sampling.bernoulliByKey(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.bernoulliByKey(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    assert(math.abs(s1.size.toDouble / n - 0.3) < 0.1) // loose CLT bound
  }

  test("stratifiedQuota: exactly min(quota, |stratum|) rows per stratum, stable") {
    val q = 20
    val sizes = Sampling.stratifiedQuota(docs, "lang", "doc_id", q)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == full.keySet)
    sizes.foreach { case (lang, c) => assert(c == math.min(q.toLong, full(lang))) }
    val a = Sampling.stratifiedQuota(docs, "lang", "doc_id", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedQuota(docs.repartition(13), "lang", "doc_id", q)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("stratifiedQuotaGuarded: identical rows to the unguarded form when a stratum ≫ quota") {
    import spark.implicits._
    // one hot stratum (5000 rows ≫ quota 8) plus small ones — the guard's
    // Bernoulli pre-filter must not change WHICH rows win
    val skewed = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 30).map(i => ("warm", 10000L + i)) ++
      Seq(("cold", 20001L))).toDF("stratum", "id")
    val q = 8
    val plain = Sampling.stratifiedQuota(skewed, "stratum", "id", q)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val guarded = Sampling.stratifiedQuotaGuarded(skewed, "stratum", "id", q)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(guarded == plain)
    assert(plain.count(_._1 == "hot") == q && plain.count(_._1 == "cold") == 1)
    // and the pre-filter actually bites: far fewer than 5000 hot rows are ranked
    val margin = q + 6.0 * math.sqrt(q.toDouble) + 10.0
    val survivors = Sampling.bernoulliByKey(
      skewed.where(col("stratum") === "hot"), "id", margin / 5000.0).count()
    assert(survivors < 200 && survivors >= q)
  }

  test("stratifiedQuotaGuarded: NULL-key rows survive the guard like the unguarded form") {
    import spark.implicits._
    val df = ((1 to 500).map(i => ("hot", s"k$i")) :+ (("hot", null.asInstanceOf[String])))
      .toDF("stratum", "key")
    val q = 5
    val plain = Sampling.stratifiedQuota(df, "stratum", "key", q)
      .collect().map(_.getString(1)).toSet
    val guarded = Sampling.stratifiedQuotaGuarded(df, "stratum", "key", q)
      .collect().map(_.getString(1)).toSet
    // NULL sha2 sorts first → the NULL-key row is in the quota both ways
    assert(plain.contains(null) && guarded == plain)
  }

  test("weightedByStratum: per-stratum fractions honored; default applies") {
    val out = Sampling.weightedByStratum(docs, "lang", "doc_id",
      Map("en" -> 1.0), default = 0.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en")) // default 0.0 drops every other stratum
    assert(out.count() == docs.where(col("lang") === "en").count()) // 1.0 keeps all
  }

  test("temperatureRates: hand-computed α=0.5 allocation, cap, α=1 identity") {
    import spark.implicits._
    // groups: a×100, b×400 → √: 10, 20; S=30; total 500; frac 0.3 →
    // rate_a = 0.3·500·10/30/100 = 0.05·... compute exactly below
    val df = ((1 to 100).map(i => (s"a$i", "a")) ++ (1 to 400).map(i => (s"b$i", "b")))
      .toDF("id", "g")
    val r = Sampling.temperatureRates(df, "g", alpha = 0.5, targetFrac = 0.3)
    val s = math.sqrt(100.0) + math.sqrt(400.0)
    assert(r("a") == 0.3 * 500 * 10.0 / s / 100)
    assert(r("b") == 0.3 * 500 * 20.0 / s / 400)
    // α=1 keeps natural proportions: every rate == targetFrac exactly
    val r1 = Sampling.temperatureRates(df, "g", alpha = 1.0, targetFrac = 0.25)
    assert(r1("a") == 0.25 && r1("b") == 0.25)
    // a tiny group whose allocation exceeds its size caps at 1
    val df2 = df.union(Seq(("c1", "c")).toDF("id", "g"))
    val r2 = Sampling.temperatureRates(df2, "g", alpha = 0.5, targetFrac = 0.9)
    assert(r2("c") == 1.0)
    // NULL groups are not a group
    val df3 = df.union(Seq(("n1", null.asInstanceOf[String])).toDF("id", "g"))
    assert(Sampling.temperatureRates(df3, "g", 0.5, 0.3).keySet == Set("a", "b"))
    assert(Sampling.temperatureMixture(df3, "g", "id", 0.5, 0.3)
      .where(org.apache.spark.sql.functions.col("g").isNull).count() == 0L,
      "NULL-group rows are dropped, never kept by accident")
  }

  test("temperatureMixture: α<1 boosts the small group's share; deterministic") {
    import spark.implicits._
    val df = ((1 to 60).map(i => (s"a$i", "big")) ++ (1 to 6).map(i => (s"b$i", "small")))
      .toDF("id", "g")
    val kept = Sampling.temperatureMixture(df, "g", "id", alpha = 0.5, targetFrac = 0.5)
    val byG = kept.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Sampling.temperatureRates(df, "g", 0.5, 0.5)
    assert(rates("small") > rates("big"),
      "temperature must boost the low-resource group's per-row rate")
    val again = Sampling.temperatureMixture(df.repartition(7), "g", "id", 0.5, 0.5)
      .orderBy("id").collect().toSeq
    assert(Sampling.temperatureMixture(df, "g", "id", 0.5, 0.5)
      .orderBy("id").collect().toSeq == again, "partitioning-invariant kept set")
    assert(byG.values.sum > 0)
  }

  test("splitAssign: total, disjoint, partitioning-invariant, near-target proportions") {
    val docs = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val a = graft.operators.Sampling.splitAssign(docs, "doc_id", splits)
      .select("doc_id", "split")
    // every row labeled exactly once
    assert(a.count() == docs.count())
    val counts = a.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // proportions within 5σ of the Bernoulli expectation
    val n = docs.count().toDouble
    splits.foreach { case (name, w) =>
      val got = counts.getOrElse(name, 0L).toDouble
      val sigma = math.sqrt(n * w * (1 - w))
      assert(math.abs(got - n * w) < 5 * sigma,
        s"$name: $got vs expected ${n * w} ±${5 * sigma}")
    }
    // stability: identical labels after a repartition (the leakage property)
    val b = graft.operators.Sampling.splitAssign(
        docs.repartition(7), "doc_id", splits)
      .select("doc_id", "split")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // invalid weights rejected
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.splitAssign(docs, "doc_id",
        Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("deterministicShuffle: stable total order, partitioning-invariant, salt-independent") {
    val docs = graft.sources.Tables.table(spark, TestSpark.sf0001, "documents")
    def order(df: org.apache.spark.sql.DataFrame, salt: String): Seq[Long] =
      graft.operators.Sampling.deterministicShuffle(df, "doc_id", salt)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val a = order(docs, "ep1")
    assert(a == order(docs.repartition(7), "ep1"),
      "the permutation must not depend on physical partitioning")
    assert(a == order(docs, "ep1"), "and must be stable across runs")
    val b = order(docs, "ep2")
    assert(a != b, "a different salt must give a different permutation")
    assert(a.sorted == b.sorted, "every row survives any salt")
    // it is a real shuffle, not near-identity: the permutation displaces rows
    val displaced = a.zip(a.sorted).count { case (x, y) => x != y }
    assert(displaced > a.length / 2)
  }

  test("leakageSafeSplit: clusters never straddle splits; singletons = splitAssign") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // planted near-dup clusters: {1,2,3}, {10,11}, {20,21,22,23}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L)).toDF("id_1", "id_2")
    val splits = Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15)
    val out = Sampling.leakageSafeSplit(docs.repartition(6), "doc_id", pairs, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every cluster lands whole
    for (cluster <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L), Seq(20L, 21L, 22L, 23L)))
      assert(cluster.map(out).distinct.size == 1, s"cluster $cluster straddles")
    // untouched docs get exactly their splitAssign label
    val plain = Sampling.splitAssign(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val untouched = out.keySet -- Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L, 23L)
    assert(untouched.forall(id => out(id) == plain(id)),
      "pair evidence must not reshuffle untouched documents")
    // proportions stay near target
    val trainFrac = out.values.count(_ == "train").toDouble / out.size
    assert(trainFrac > 0.6 && trainFrac < 0.8, s"train frac $trainFrac")
    // string ids fail loud
    intercept[IllegalArgumentException](
      Sampling.leakageSafeSplit(docs.select(col("text"), col("doc_id")),
        "text", pairs, splits))
  }

  test("weightedSample: exactly k rows, matches the driver-side A-ES reference") {
    import java.security.MessageDigest
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, (i % 17 + 1).toDouble))
    val df = rows.toDF("id", "w").repartition(7)
    // driver reference: identical sha256 prefix → -ln((h+0.5)/2^32)/w
    def aes(id: Long, w: Double, salt: String): Double = {
      val hex = MessageDigest.getInstance("SHA-256")
        .digest(s"$id:$salt".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16).toDouble
      -math.log((h + 0.5) / 4294967296.0) / w
    }
    val expect = rows.sortBy { case (i, w) => (aes(i, w, "t1"), i) }.take(50)
      .map(_._1).toSet
    val got = Sampling.weightedSample(df, "id", col("w"), 50, salt = "t1")
      .select("id").as[Long].collect().toSet
    assert(got == expect && got.size == 50)
    // partitioning invariance
    val got1 = Sampling.weightedSample(df.coalesce(1), "id", col("w"), 50, "t1")
      .select("id").as[Long].collect().toSet
    assert(got1 == got)
  }

  test("weightedSample: weight-proportional inclusion, zero/NULL weights excluded") {
    import spark.implicits._
    // 100 rows at weight 9 vs 100 at weight 1: across salts the heavy rows
    // must dominate the k=40 sample (expected ≈ 9:1 inclusion odds)
    val rows = (1L to 100L).map(i => (i, 9.0)) ++ (101L to 200L).map(i => (i, 1.0))
    val df = rows.toDF("id", "w")
    val heavyShare = (1 to 10).map { s =>
      val ids = Sampling.weightedSample(df, "id", col("w"), 40, s"salt$s")
        .select("id").as[Long].collect()
      ids.count(_ <= 100).toDouble / ids.length
    }
    val mean = heavyShare.sum / heavyShare.size
    assert(mean > 0.75 && mean < 1.0, s"heavy-row share $mean not ∝ weights")
    val withBad = rows.toDF("id", "w")
      .union(Seq((900L, 0.0), (901L, -3.0)).toDF("id", "w"))
      .union(Seq((902L, Option.empty[Double])).toDF("id", "w"))
    val ids = Sampling.weightedSample(withBad, "id", col("w"), 200, "z")
      .select("id").as[Long].collect().toSet
    assert(!ids.exists(_ >= 900L), "zero/negative/NULL weights must never sample")
  }

  test("weightedSampleByStratum: exact k per stratum, same race keys") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (if (i % 3 == 0) "a" else "b", i, (i % 5 + 1).toDouble))
    val df = rows.toDF("g", "id", "w").repartition(5)
    val out = Sampling.weightedSampleByStratum(df, "g", "id", col("w"), 20, "t2")
      .select("g", "id").as[(String, Long)].collect()
    assert(out.groupBy(_._1).view.mapValues(_.length).toMap == Map("a" -> 20, "b" -> 20))
    // each stratum's winners are the global race restricted to the stratum
    val global = Sampling.weightedSample(df.where(col("g") === "a"), "id",
      col("w"), 20, "t2").select("id").as[Long].collect().toSet
    assert(out.filter(_._1 == "a").map(_._2).toSet == global)
  }

  test("materializeEpochs: integer epochs repeat exactly, fractional by hash, zero drops") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b"))
      .toDF("id", "g")
    val epochs = Seq(("a", 2.0), ("b", 0.5)).toDF("g", "epochs")
    val out = Sampling.materializeEpochs(docs, "id", "g", epochs)
      .select("g", "id", "copy").as[(String, Long, Long)].collect()
    // group a: every doc exactly twice, copies 1 and 2
    val a = out.filter(_._1 == "a")
    assert(a.length == 200 && a.groupBy(_._2).forall(_._2.length == 2))
    assert(a.map(_._3).toSet == Set(1L, 2L))
    // group b: ~50% of docs exactly once — deterministic, and re-running
    // yields the identical id set
    val b1 = out.filter(_._1 == "b").map(_._2).toSet
    assert(b1.size > 20 && b1.size < 80, s"~50 of 100 expected, got ${b1.size}")
    val again = Sampling.materializeEpochs(docs, "id", "g", epochs)
      .where(col("g") === "b").select("id").as[Long].collect().toSet
    assert(again == b1)
    // zero epochs -> group absent entirely; missing group (NULL) too
    val withZero = Sampling.materializeEpochs(docs, "id", "g",
      Seq(("a", 0.0)).toDF("g", "epochs"))
    assert(withZero.count() == 0)
    intercept[Exception] {
      Sampling.materializeEpochs(docs, "id", "g",
        Seq(("a", -1.0)).toDF("g", "epochs")).collect()
    }
  }
}
