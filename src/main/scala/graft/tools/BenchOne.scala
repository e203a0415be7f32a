package graft.tools
import org.apache.spark.sql.SparkSession
/** Isolated per-entry timing: one warmup + median of 3 steady runs per named
  * entry (same protocol as Bench, so TIMING_DELTA compares like with like),
  * appended to /tmp/timings.txt. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val log = new java.io.PrintWriter(new java.io.FileWriter("/tmp/timings.txt", true), true)
    def releaseState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    names.foreach { n =>
      try {
        def run(): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          releaseState()
          t
        }
        run() // warmup: JIT + codegen + file listing
        val med = Seq.fill(3)(run()).sorted.apply(1)
        log.println(f"TIMING $n $med%.2f")
      } catch { case e: Throwable => log.println(s"TIMING $n FAILED ${e.getMessage.take(100)}") }
    }
    log.close()
    spark.stop()
  }
}
