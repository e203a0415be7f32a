package graft.tools
import org.apache.spark.sql.functions._
object ProfileX02 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "prof")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.1", "documents")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f"); r
    }
    graft.plans.HashExpressions.register(spark)
    time("warmup")(docs.count())
    time("shingle-native") {
      docs.select(col("doc_id").as("__id"),
        call_function("graft_shingle_hashes", col("text"), lit(3)).as("__hs"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sig-native") {
      docs.select(col("doc_id").as("__id"),
        call_function("graft_minhash_sig",
          call_function("graft_shingle_hashes", col("text"), lit(3)), lit(128)).as("__sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full-candidates") {
      graft.operators.NearDup.minhashCandidates(docs, "doc_id", "text").count()
    }
    time("full-neardups") {
      graft.operators.NearDup.nearDuplicates(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
