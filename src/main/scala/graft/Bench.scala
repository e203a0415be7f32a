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
      name -> time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }
    val results = ordered.map { case (name, fn) =>
      name -> time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val warmTotal = warmup.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","first_pass_total":$warmTotal,"passes":2}""")
    spark.stop()
  }
}
