package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobiEigen: A·v = λ·v and V orthonormal on a known symmetric matrix") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.2, 0.1),
      Array(0.5, 0.2, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    val n = a.length
    // eigen equation per column
    (0 until n).foreach { c =>
      val v = (0 until n).map(i => vecs(i)(c))
      val av = (0 until n).map(i => (0 until n).map(j => a(i)(j) * v(j)).sum)
      (0 until n).foreach(i =>
        assert(math.abs(av(i) - vals(c) * v(i)) < 1e-9,
          s"A·v != λ·v at col $c row $i"))
    }
    // orthonormality
    (0 until n).foreach { c1 =>
      (0 until n).foreach { c2 =>
        val dot = (0 until n).map(i => vecs(i)(c1) * vecs(i)(c2)).sum
        val want = if (c1 == c2) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"V not orthonormal at ($c1,$c2): $dot")
      }
    }
    // trace preserved
    assert(math.abs(vals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9)
  }

  // Synthetic corpus: dominant variance along a planted direction u, small
  // isotropic jitter elsewhere. dim=6 for readable assertions.
  private val dim = 6
  private val u = {
    val raw = Array(1.0, 2.0, -1.0, 0.5, 0.0, 1.5)
    val nrm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / nrm)
  }
  private val planted = (0 until 200).map { i =>
    val rnd = new scala.util.Random(i)
    val t = (i % 21) - 10.0 // strong spread along u
    val x = Array.tabulate(dim)(d => (t * u(d) + 0.05 * (rnd.nextDouble() - 0.5)).toFloat)
    (i.toLong, x.toSeq)
  }.toDF("vec_id", "embedding")

  test("fit recovers the planted dominant direction, eigenvalues descending") {
    val model = Pca.fit(planted, "embedding", dim, k = 3)
    val c0 = model.components(0)
    val cos = math.abs(c0.zip(u).map { case (a, b) => a * b }.sum) /
      math.sqrt(c0.map(x => x * x).sum)
    assert(cos > 0.999, s"top component must align with the planted direction: $cos")
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      s"eigenvalues must be descending: ${model.eigenvalues.toSeq}")
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1),
      "the planted direction must dominate")
  }

  test("project matches the JVM computation; map-only plan") {
    val model = Pca.fit(planted, "embedding", dim, k = 2)
    val out = Pca.project(planted, "embedding", model)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    val got = out.select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val rows = planted.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { case (id, x) =>
      val want = model.components.map(w =>
        // same fold as zip_with+aggregate: left-to-right over dims
        x.indices.foldLeft(0.0)((acc, i) => acc + (x(i).toDouble - model.mean(i)) * w(i)))
      val g = got(id)
      want.indices.foreach(c =>
        assert(math.abs(g(c) - want(c)) < 1e-12, s"projection mismatch vec $id comp $c"))
    }
  }

  test("native graft_pca_project ≡ HOF projection bit-identically; null contracts hold") {
    val model = Pca.fit(planted, "embedding", dim, k = 3)
    val native = Pca.project(planted, "embedding", model)
      .select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = Pca.projectHof(planted, "embedding", model)
      .select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(native == hof, "native expression must reproduce the HOF fold bit-identically")
    // null + ragged vectors yield NULL through the native path too
    val bad = planted.limit(0)
      .union(Seq((1L, null.asInstanceOf[Seq[Float]]), (2L, Seq(1.0f)))
        .toDF("vec_id", "embedding"))
    val nulls = Pca.project(bad, "embedding", model).select("pca").collect()
    assert(nulls.forall(_.isNullAt(0)), "null/ragged inputs must project to NULL")
  }

  test("projection preserves pairwise distances of the dominant structure") {
    // k=1 keeps the planted axis: ordering along u must be preserved exactly
    val model = Pca.fit(planted, "embedding", dim, k = 1)
    val proj = Pca.project(planted, "embedding", model)
      .select("vec_id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).head).toMap
    // vectors were planted at t = (i % 21) - 10: same t → near-equal
    // projection, |t1 - t2| large → projections far apart (sign may flip)
    val sign = math.signum(proj(11L) - proj(0L)) // t: 0 -> -10, 11 -> +1
    (0 until 200).foreach { i =>
      val t = (i % 21) - 10.0
      val p = proj(i.toLong) * sign
      val t0 = proj(10L) * sign // t = -10 + 10 = 0 reference
      assert(math.abs((p - t0) - t) < 0.1,
        s"1-D projection must recover the planted coordinate: vec $i t=$t got ${p - t0}")
    }
  }

  test("PCA -> PQ composition: quantize the decorrelated projection end to end") {
    // the OPQ-lite pipeline: project to the top-k axes, PQ-encode the
    // projection — smaller dim, decorrelated subspaces. End-to-end over
    // the planted corpus: ADC top-1 on projected codes must still surface
    // same-t neighbors (the structure lives on the planted axis).
    val model = Pca.fit(planted, "embedding", dim, k = 4)
    val projected = Pca.project(planted, "embedding", model, outCol = "proj")
    val cb = graft.operators.ProductQuantization.trainPq(
      projected, "vec_id", "proj", dim = 4, m = 2, ksub = 8, iters = 1)
    val codes = graft.operators.ProductQuantization.encode(projected, "proj", cb)
    val queries = projected.where(col("vec_id") < 3)
    val top = graft.operators.ProductQuantization.pqTopKAll(codes, queries,
        "vec_id", "pq_code", "vec_id", "proj", cb, k = 5, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    (0L until 3L).foreach { q =>
      val tOf = (i: Long) => (i % 21) - 10.0
      val deltas = top(q).toSeq.map(t => math.abs(tOf(t) - tOf(q)))
      // ksub=8 codes over a 21-wide t-range are ~3 t-units wide: most
      // neighbors must be near, and none may come from the far side
      assert(deltas.count(_ <= 3.0) >= 3,
        s"query $q (t=${tOf(q)}): too few near neighbors, deltas=$deltas")
      assert(deltas.forall(_ <= 8.0),
        s"query $q (t=${tOf(q)}): far-side neighbor leaked through, deltas=$deltas")
    }
  }

  test("fit ignores null vectors; guards on k and corpus size") {
    val withNulls = planted.union(
      Seq((999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val a = Pca.fit(withNulls, "embedding", dim, k = 2)
    val b = Pca.fit(planted, "embedding", dim, k = 2)
    assert(a.mean.toSeq == b.mean.toSeq, "null vectors must not perturb the fit")
    intercept[IllegalArgumentException] { Pca.fit(planted, "embedding", dim, k = 0) }
    intercept[IllegalArgumentException] { Pca.fit(planted, "embedding", dim, k = dim + 1) }
  }

  test("one-pass Gramian moments ≡ pair-explode moments on the same frame") {
    // Differential pin of the fit path: the native single-scan aggregate
    // must reproduce the round-6 explode formulation's (n, μ, Σ) up to
    // double-fold reassociation. Ragged + null vectors included to pin the
    // shared input contract.
    val ragged = planted
      .union(Seq((997L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
      .union(Seq((998L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"))
      .repartition(7)
    val (n1, mu1, cov1) = Pca.momentsByGramian(ragged, "embedding", dim)
    val (n2, mu2, cov2) = Pca.momentsByExplode(ragged, "embedding", dim)
    assert(n1 == n2 && n1 == 200L, s"row counts differ: $n1 vs $n2")
    (0 until dim).foreach(i =>
      assert(math.abs(mu1(i) - mu2(i)) < 1e-12, s"mean differs at $i"))
    (0 until dim).foreach(i => (0 until dim).foreach(j =>
      assert(math.abs(cov1(i)(j) - cov2(i)(j)) < 1e-9,
        s"covariance differs at ($i,$j): ${cov1(i)(j)} vs ${cov2(i)(j)}")))
  }

  test("fit accepts DOUBLE element arrays (residual-frame shape), same model as float") {
    // Pca.fit must work on array<double> inputs (e.g. residual frames) —
    // the Gramian aggregate's element reader branches on the element type.
    val asDouble = planted.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val a = Pca.fit(asDouble, "embedding", dim, k = 2)
    val b = Pca.fit(planted, "embedding", dim, k = 2)
    a.mean.indices.foreach(i =>
      assert(math.abs(a.mean(i) - b.mean(i)) < 1e-12, s"mean differs at $i"))
    a.eigenvalues.indices.foreach(i =>
      assert(math.abs(a.eigenvalues(i) - b.eigenvalues(i)) < 1e-9,
        s"eigenvalue differs at $i"))
  }

  test("Gramian aggregate: one job, one buffer row per partition, no explode") {
    graft.plans.HashExpressions.register(spark)
    val plan = planted.repartition(7)
      .where(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(call_function("graft_gramian", col("embedding"), lit(dim)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"fit path must not explode rows:\n$plan")
    assert(plan.contains("graft_gramian"), plan)
  }
}
