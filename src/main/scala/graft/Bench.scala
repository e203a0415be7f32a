package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results go to the `noop` sink so the WHOLE plan
  * (projections included) executes — `count()` would let Spark skip
  * expression evaluation entirely. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt, "graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.ensureConfs(spark)

    // Release per-entry state so one entry's caches can't pollute the next
    // entry's number: the X-operators localCheckpoint their (small) results,
    // and those blocks are owned by frames this loop immediately drops —
    // without an explicit sweep the block manager accumulates ~40 checkpoint
    // RDDs by pass 2 and the small entries pay GC/eviction noise (the r3
    // events-cluster mirage). getPersistentRDDs covers BOTH persist() frames
    // and localCheckpoint block RDDs; clearCache covers catalog-registered
    // cached plans.
    def releaseState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      try fn catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Two full passes in one JVM: pass 1 absorbs JIT + codegen + plan-cache
    // + file-listing warmup (measured ~1.5s/query of fixed first-run cost);
    // pass 2 is the steady-state number a long-lived cluster session sees —
    // that is what gets reported per query.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val warmup = ordered.map { case (name, fn) =>
      val t = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      releaseState()
      name -> t
    }
    val results = ordered.map { case (name, fn) =>
      val t = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      releaseState()
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val warmTotal = warmup.map(_._2).filter(_ >= 0).sum

    // Steady-state guard: diff pass-2 numbers against the BenchOne isolated
    // timing log when one exists — a mechanical tripwire for measurement
    // artifacts (entry >1.3× its isolated number AND >0.3s absolute drift).
    val isoLog = new java.io.File("/tmp/timings.txt")
    val delta =
      if (!isoLog.isFile) "absent"
      else {
        val src = scala.io.Source.fromFile(isoLog)
        val iso =
          try src.getLines().flatMap { l =>
            l.trim.split("\\s+") match {
              case Array("TIMING", n, v) => scala.util.Try(n -> v.toDouble).toOption
              case _ => None
            }
          }.toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
          finally src.close()
        val sus = results.collect {
          case (n, v) if iso.contains(n) && v > 1.3 * iso(n) && v - iso(n) > 0.3 =>
            f""""$n":[$v%.2f,${iso(n)}%.2f]"""
        }
        if (sus.isEmpty) "none" else sus.mkString("{", ",", "}")
      }
    System.err.println(s"TIMING_DELTA $delta")

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","first_pass_total":$warmTotal,"passes":2}""")
    spark.stop()
  }
}
