package graft.tools
import org.apache.spark.sql.functions._
object ProfileQ29 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "prof29")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f"); r }
    val ev = graft.sources.Tables.table(spark, d, "events")
    time("warmup")(ev.count())
    time("scan-only")(ev.select("event_id").write.format("noop").mode("overwrite").save())
    time("json-nosort")(ev.select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      .write.format("noop").mode("overwrite").save())
    time("full-q29")(graft.Queries.queries("q29_json_extract")(spark, d)
      .write.format("noop").mode("overwrite").save())
    time("from_json-nosort")(ev.select(col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
