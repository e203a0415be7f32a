package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SchemaDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
      println(s"== $n: ${df.count()} rows")
      println(df.schema.treeString)
      if (n == "events") {
        val e = df.withColumn("ts2",
          timestamp_micros((col("ts") / 1000).cast("long")).cast("timestamp_ntz"))
        e.select("event_id","ts","ts2","user_id","event_type","value","props").show(3, false)
      } else df.show(2, 60)
    }
    spark.stop()
  }
}
