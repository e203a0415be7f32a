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
    time("raw-band-pairs") {
      val sig = docs.select(col("doc_id").as("__id"),
        call_function("graft_minhash_sig",
          call_function("graft_shingle_hashes", col("text"), lit(3)), lit(128)).as("__sig"))
        .persist()
      val banded = sig.select(col("__id"),
        posexplode(array((0 until 32).map { b =>
          xxhash64(((b * 4) until ((b + 1) * 4))
            .map(i => element_at(col("__sig"), i + 1)) :+ lit(b): _*)
        }: _*)).as(Seq("__band", "__bh")))
      val a = banded.select(col("__band"), col("__bh"), col("__id").as("id_1"))
      val b = banded.select(col("__band"), col("__bh"), col("__id").as("id_2"))
      val cand = a.join(b, Seq("__band", "__bh")).where(col("id_1") < col("id_2"))
      println("  raw=" + cand.count())
      println("  dedup=" + cand.select("id_1", "id_2").dropDuplicates("id_1","id_2").count())
      sig.unpersist()
    }
    time("full-candidates") {
      println("  n=" + graft.operators.NearDup.minhashCandidates(docs, "doc_id", "text").count())
    }
    time("full-neardups") {
      graft.operators.NearDup.nearDuplicates(docs, "doc_id", "text").count()
    }
    time("simhash-sig") {
      docs.select(call_function("graft_simhash",
        graft.functions.TextAnalysis.tokens(col("text"))))
        .write.format("noop").mode("overwrite").save()
    }
    time("simhash-pairs-mb8") {
      println("  n=" + graft.operators.NearDup.simhashPairs(docs, "doc_id", "text", maxBits = 8).count())
    }
    time("simhash-pairs-mb3") {
      println("  n=" + graft.operators.NearDup.simhashPairs(docs, "doc_id", "text", maxBits = 3).count())
    }
    spark.stop()
  }
}
