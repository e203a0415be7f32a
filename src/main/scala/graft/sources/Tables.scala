package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The reference engine's tables live in Postgres and are reached over
  * COPY/libpq (`/root/reference/src/airflow_postgres_csv/operators.py:80,163-170`);
  * here the equivalent catalog is a directory of parquet files read through the
  * Spark parquet scan, which gives column pruning + predicate pushdown for free
  * — at 100 TB these scans are the dominant cost, so every query keeps its
  * filters/projections directly on top of the scan so Catalyst pushes them down.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = {
      if (name == "events")
        // Older fixture generations wrote events.ts as parquet TIMESTAMP(NANOS),
        // which Spark's reader rejects (PARQUET_TYPE_ILLEGAL) unless nanos are
        // read as raw Long (legacy conf, set in GraftSession and re-ensured
        // here for driver-built sessions).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
    }
    if (name == "events") {
      // Normalize ts to TIMESTAMP_NTZ regardless of fixture vintage:
      //  - int64 nanos (legacy TIMESTAMP(NANOS) fixtures): truncate to micros
      //    exactly like DuckDB's parquet reader does (integer division).
      //  - native timestamp[us] (current fixtures): plain NTZ cast.
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts",
            timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
        case _ =>
          df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
    } else df
  }

  /** Register every table as a temp view so `spark.sql` text matches the
    * DuckDB oracle's table names. Idempotent. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
