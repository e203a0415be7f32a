package graft.tools
import org.apache.spark.sql.SparkSession

/** Print the formatted plan for one SparkEntry query — plan-shape debugging. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "explain")
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
