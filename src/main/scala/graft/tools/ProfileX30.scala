package graft.tools

import org.apache.spark.sql.functions._

/** One-off stage breakdown for the x30 semantic-dedup gate (dev tool). */
object ProfileX30 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "profile-x30")
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.table(spark, sfDir, "embeddings")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup whole pipeline once
    time("whole_warmup") {
      graft.operators.NearDup.semanticDedupe(e, "vec_id", "embedding",
        minCosine = 0.45, nlist = 8, refineIters = 2, probes = 2)
        .write.format("noop").mode("overwrite").save()
    }
    val cents = time("trainIvf") {
      graft.operators.SimilaritySearch.trainIvf(e, "vec_id", "embedding", 8, 2)
    }
    val pairs = time("cellPairs_count") {
      val p = graft.operators.NearDup.cellPairs(e, "vec_id", "embedding",
        cents, 0.45, 2)
      val n = p.count(); println(s"  pairs=$n"); p
    }
    time("components") {
      graft.operators.ConnectedComponents.components(pairs, "id_1", "id_2").count()
    }
    time("keepReps_total") {
      graft.operators.Dedup.keepClusterRepresentatives(e, "vec_id", pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
