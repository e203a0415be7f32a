package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage timing for x08_range_join_binned — where do 6s go? */
object ProfileX08 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "profile-x08")
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val ord = graft.sources.Tables.table(spark, sfDir, "orders")
    println("lineitem rows: " + li.count() + " orders rows: " + ord.count())
    for (round <- 1 to 2) {
      t(s"r$round scan+unix_date") {
        noop(li.select(unix_date(col("l_shipdate").cast("date")).as("__p")))
      }
      t(s"r$round interval side") {
        noop(ord.where(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), unix_date(col("o_orderdate").cast("date")).as("__lo"))
          .withColumn("__hi", col("__lo") + 7))
      }
      t(s"r$round full join") {
        val pts = li.select(unix_date(col("l_shipdate").cast("date")).as("__p"))
        val ivs = ord.where(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), unix_date(col("o_orderdate").cast("date")).as("__lo"))
          .withColumn("__hi", col("__lo") + 7)
        noop(graft.operators.RangeJoin.pointInInterval(pts, "__p", ivs, "__lo", "__hi", 8))
      }
      t(s"r$round full query") {
        noop(graft.SparkEntry.queries("x08_range_join_binned")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
