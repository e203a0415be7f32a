package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Contamination

class ContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely unrelated text about spark shuffle exchanges"),
    (3L, "the quick brown fox jumps somewhere else entirely today"))
    .toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "we ask whether the quick brown fox jumps over obstacles"))
    .toDF("bench_id", "btext")

  test("overlapPairs: exact shared 5-gram counts against the benchmark") {
    val out = Contamination.overlapPairs(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5)
      .orderBy("corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 shares "the quick brown fox jumps" and "quick brown fox jumps over";
    // doc 3 shares only the first; doc 2 shares nothing
    assert(out.toSeq == Seq((1L, 100L, 2L), (3L, 100L, 1L)))
  }

  test("minShared thresholds the pair set; contaminatedIds agrees on both paths") {
    val strict = Contamination.overlapPairs(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    assert(strict == Set(1L))
    val ids1 = Contamination.contaminatedIds(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5, minShared = 1)
      .collect().map(_.getLong(0)).toSet
    val ids2 = Contamination.contaminatedIds(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    assert(ids1 == Set(1L, 3L) && ids2 == Set(1L),
      "semi-join fast path and pair-count path must agree with their thresholds")
  }

  test("broadcast guard: forced, disabled, and auto-fallback paths agree") {
    def pairs(force: Option[Boolean]) =
      Contamination.overlapPairs(corpus, "doc_id", "text",
          bench, "bench_id", "btext", k = 5, benchBroadcast = force)
        .orderBy("corpus_id").collect().map(_.toString).toSeq
    val on = pairs(Some(true))
    assert(on == pairs(Some(false)),
      "shuffle-join path must equal the broadcast path")
    val conf = spark.conf
    val before = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // 1-byte threshold: the size estimate can never fit → the auto path
      // MUST take the shuffle-join fallback
      conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      assert(pairs(None) == on, "auto fallback must match the broadcast result")
      val clean = Contamination.decontaminate(corpus, "doc_id", "text",
          bench, "bench_id", "btext", k = 5)
        .collect().map(_.getLong(0)).toSet
      assert(clean == Set(2L), "decontaminate via the fallback path")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("decontaminate removes exactly the contaminated documents") {
    val clean = Contamination.decontaminate(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L))
  }

  test("semantic decontamination drops exactly the cosine-close corpus vectors") {
    // bench vector ~ (1,0,0); corpus: 10 aligned (contaminated), 20 nearly
    // orthogonal with slight positive leak, 30 anti-aligned
    val corpus = Seq(
      (10L, Seq(0.9f, 0.1f, 0.0f)),
      (20L, Seq(0.1f, 1.0f, 0.0f)),
      (30L, Seq(-1.0f, 0.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val benchV = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("bench_id", "embedding")
    val ids = Contamination.semanticContaminatedIds(
        corpus, "vec_id", "embedding", benchV, "embedding", minCosine = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(10L), s"only the aligned vector is contaminated: $ids")
    val kept = Contamination.semanticDecontaminate(
        corpus, "vec_id", "embedding", benchV, "embedding", minCosine = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(20L, 30L))
  }

  test("contaminated-id anti-join: guarded broadcast degrades to shuffle, identical results") {
    def antiJoinLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("LeftAnti")).toSeq
    // default threshold, tiny corpus: the id set's estimate fits → the
    // anti-join plans as a broadcast join with ZERO pre-action jobs
    val byDefault = Contamination.decontaminate(corpus, "doc_id", "text",
      bench, "bench_id", "btext", k = 5)
    assert(antiJoinLines(byDefault).exists(_.contains("Broadcast")),
      s"bench-bounded id set must broadcast:\n${antiJoinLines(byDefault)}")
    val expected = byDefault.collect().map(_.getLong(0)).toSet
    assert(expected == Set(2L))
    val conf = spark.conf
    val before = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // 1-byte threshold: estimate can't fit, the exact count (rung 2)
      // can't either → the anti-join MUST degrade to a non-broadcast join
      conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
      val auto = Contamination.decontaminate(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5)
      val lines = antiJoinLines(auto)
      assert(lines.nonEmpty && lines.forall(!_.contains("Broadcast")),
        s"above-threshold id set must not broadcast:\n$lines")
      assert(auto.collect().map(_.getLong(0)).toSet == expected,
        "shuffle fallback must produce identical results")
      // same contract on the semantic (embedding) anti-join
      val corpusV = Seq(
        (10L, Seq(0.9f, 0.1f, 0.0f)),
        (20L, Seq(0.1f, 1.0f, 0.0f)),
        (30L, Seq(-1.0f, 0.0f, 0.1f)))
        .toDF("vec_id", "embedding")
      val benchV = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("bench_id", "embedding")
      val sem = Contamination.semanticDecontaminate(
        corpusV, "vec_id", "embedding", benchV, "embedding", minCosine = 0.8)
      val semLines = antiJoinLines(sem)
      assert(semLines.nonEmpty && semLines.forall(!_.contains("Broadcast")),
        s"semantic anti-join must not broadcast above threshold:\n$semLines")
      assert(sem.collect().map(_.getLong(0)).toSet == Set(20L, 30L))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("auto guard decides from plan statistics: ZERO jobs before the result action") {
    // The round-6 guard ran an eager count() over the bench postings per
    // call — the only bench regression that round. The stats-based guard
    // must plan (and decide broadcast vs shuffle) without launching any job.
    val sc = spark.sparkContext
    val stat = new org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(stat)
    try {
      val planned = Contamination.overlapPairs(corpus, "doc_id", "text",
        bench, "bench_id", "btext", k = 5) // benchBroadcast = None (auto)
      val plan = planned.queryExecution.executedPlan.toString
      Thread.sleep(300) // let any stray job-start events reach the listener
      assert(stat.jobs.get() == 0,
        s"guard decision must not run jobs, saw ${stat.jobs.get()}")
      // tiny in-memory bench → the estimate fits → broadcast join planned
      assert(plan.contains("BroadcastHashJoin"),
        s"small bench must still plan as a broadcast join:\n$plan")
    } finally sc.removeSparkListener(stat)
  }
}
