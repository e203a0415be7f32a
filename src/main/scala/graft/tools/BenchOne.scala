package graft.tools
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val log = new java.io.PrintWriter(new java.io.FileWriter("/tmp/timings.txt", true), true)
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        log.println(f"TIMING $n ${(System.nanoTime()-t0)/1e9}%.2f")
      } catch { case e: Throwable => log.println(s"TIMING $n FAILED ${e.getMessage.take(100)}") }
    }
    log.close()
    spark.stop()
  }
}
