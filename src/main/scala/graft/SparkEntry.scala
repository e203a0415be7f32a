package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed training-data pipeline (SURVEY.md §2c): quality filter →
    * exact dedup → stratified sample → per-language token accounting —
    * native text-stats expression, window dedup/sample, partial+final
    * aggregation, all oracle-matched end to end (x10). */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("x10_training_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
