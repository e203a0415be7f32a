package graft.tools
import org.apache.spark.sql.functions._

/** Stage timing for x02b_simhash_pairs at sf0.1 — where do ~5s go? */
object ProfileX02b {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "prof-x02b")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.table(spark, "/root/testdata/sf0.1", "documents")
    graft.plans.HashExpressions.register(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    println("docs=" + docs.count())
    for (round <- 1 to 2) {
      time(s"r$round tokens-only") {
        noop(docs.select(graft.functions.TextAnalysis.tokens(col("text"))))
      }
      time(s"r$round simhash-sig") {
        noop(docs.select(col("doc_id"),
          call_function("graft_simhash",
            graft.functions.TextAnalysis.tokens(col("text"))).as("__sh")))
      }
      time(s"r$round sig+persist+45-explode") {
        val sig = docs.select(col("doc_id").as("__id"),
          call_function("graft_simhash",
            graft.functions.TextAnalysis.tokens(col("text"))).as("__sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tables = (0 until 10).combinations(2).toSeq
        val banded = sig.select(col("__id"), col("__sh"),
          explode(array(tables.zipWithIndex.map { case (blocks, tid) =>
            xxhash64((lit(tid) +: blocks.map(b =>
              shiftright(col("__sh"), b * 6).bitwiseAND((1L << 6) - 1L))): _*)
          }: _*)).as("__bh"))
        noop(banded)
        sig.unpersist()
      }
      time(s"r$round full simhashPairs mb8") {
        println("  n=" + graft.operators.NearDup
          .simhashPairs(docs, "doc_id", "text", maxBits = 8).count())
      }
    }
    spark.stop()
  }
}
