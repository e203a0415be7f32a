package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed tables: pre-shuffled, co-located storage for repeated joins and
  * aggregations on the same key (SURVEY.md "bucketing for co-located joins").
  *
  * At 100 TB the win is structural: two tables bucketed on the join key into
  * the same bucket count join WITHOUT any Exchange — the shuffle was paid
  * once at write time and amortizes over every subsequent query. The same
  * layout serves `groupBy(bucketKey)` with no exchange either.
  * `PlanQualitySpec` pins the no-Exchange property.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty)
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Hive-style partitioned layout (`.../col=value/...`): at 100 TB the
    * dominant scan optimization is never opening irrelevant partitions — a
    * predicate on the partition column becomes a PartitionFilter that prunes
    * directories at planning time (pinned in PlanQualitySpec). Typical use:
    * events partitioned by event date. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty)
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
