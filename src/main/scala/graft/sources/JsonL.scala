package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format of LLM data pipelines
  * (one JSON object per line; corpora ship as *.jsonl / *.jsonl.gz). The
  * reference moves CSV only (`/root/reference/src/airflow_postgres_csv/
  * operators.py`); this extends the same transfer surface to JSONL with the
  * same contracts: explicit schema, loud missing-input errors, exact-path
  * single-file export with a row count, gzip both directions.
  *
  * Scale notes: the schema is REQUIRED on read — Spark's JSON inference is a
  * full extra pass over the data (at 100 TB, a second 100 TB scan before any
  * work starts). Corrupt lines land in `_corrupt_record` when `keepCorrupt`
  * (audit-friendly) or fail the job under FAILFAST otherwise — silent row
  * drops (DROPMALFORMED) are not offered. Plain-`.gz` JSONL is not
  * splittable: one file = one task — prefer directories of moderate files
  * (or recompress) at scale, same caveat the CSV path documents. */
object JsonL {

  /** Read JSONL with an explicit schema. `failFast = false` adds a
    * `_corrupt_record` column capturing undecodable lines instead of
    * failing — the auditable form of tolerance. */
  def read(spark: SparkSession, path: String, schema: StructType,
           failFast: Boolean = true): DataFrame = {
    // loud missing-input check for plain local paths (the reference's
    // contract); scheme'd URIs (hdfs://, s3a://) and glob patterns defer to
    // the datasource's own resolution — File("/x/*.jsonl").exists is always
    // false, it would reject valid globs
    val isGlob = path.exists("*?[{".contains(_))
    if (!path.contains("://") && !isGlob && !new java.io.File(path).exists)
      throw new graft.operators.MissingInputException(path)
    val base = spark.read
      .schema(if (failFast) schema
              else schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    base.json(path)
  }

  /** Distributed JSONL write (directory of part files — the scale form). */
  def writeDir(df: DataFrame, path: String, gzip: Boolean = false): Unit =
    df.write
      .option("compression", if (gzip) "gzip" else "none")
      .option("ignoreNullFields", "false") // explicit nulls: lossless round-trip
      .mode("overwrite")
      .json(path)

  /** Single-file JSONL export at an EXACT caller-chosen path, returning the
    * row count — same design as [[PgCsv.writeSingleFile]]: compute stays
    * fully distributed (parallel part writes), only the final byte concat is
    * serial (gzip members concatenate legally; plain parts are newline-
    * terminated lines). Row count via `Observation` on the same pass. */
  def writeSingleFile(df: DataFrame, targetPath: String,
                      gzip: Boolean = false): Long =
    SingleFile.write(df, targetPath, header = None,
      (counted, tmp) => writeDir(counted, tmp, gzip))

  /** Streaming JSONL ingest (continuous corpus drops): each arriving file
    * lands as a micro-batch with the SAME schema/corrupt-line contract as
    * the batch [[read]] — compose with `CsvToTable.streamToTable` for
    * exactly-once table ingestion. */
  def readStream(spark: SparkSession, dir: String, schema: StructType,
                 failFast: Boolean = true): DataFrame =
    spark.readStream
      .schema(if (failFast) schema
              else schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
}
