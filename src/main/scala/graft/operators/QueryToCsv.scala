package graft.operators

import org.apache.spark.sql.SparkSession
import graft.sql.SqlRunner
import graft.sources.{CsvDialect, PgCsv}

/** E1 — the Spark-native `PostgresToCsvOperator`
  * (`/root/reference/src/airflow_postgres_csv/operators.py:12-98`).
  *
  * Parameter surface mirrors the reference signature
  * `(conn_id, csv_file_path, sql, parameters, has_header, compression,
  * timeout)`; the connection is the SparkSession. Composition of the owned
  * behaviors: E3 `.sql`-file loading + E4 named params + E5 normalization
  * (via [[SqlRunner]]), E7 header toggle, E8 gzip, E13 row-count result, E6
  * timeout watchdog. The query itself runs on Catalyst — the part the
  * reference delegated to Postgres (`operators.py:80`).
  */
object QueryToCsv {

  final case class Result(csvFilePath: String, rowCount: Long)

  /** Range partitioning for parallel JDBC reads: N concurrent connections
    * each scanning a slice of `column` — the scale upgrade over the
    * reference's single socket (`operators.py:85`). */
  final case class JdbcPartitioning(column: String, lower: Long, upper: Long,
                                    numPartitions: Int)

  /** E1 with a REAL external database source: the SQL text executes inside
    * the source engine via JDBC `query` pushdown — the exact delegation
    * semantics of the reference's `COPY (<sql>) TO STDOUT`
    * (`operators.py:80`), with the result streamed to a single CSV file.
    * With `partitioning`, the pushed query becomes a parallel range scan. */
  def fromJdbc(spark: SparkSession,
               url: String,
               sql: String,
               csvFilePath: String,
               connectionProperties: java.util.Properties = new java.util.Properties(),
               hasHeader: Boolean = true,
               compression: Option[String] = None,
               timeoutMinutes: Long = TimeoutGuard.DefaultTimeoutMinutes,
               partitioning: Option[JdbcPartitioning] = None,
               dialect: CsvDialect = CsvDialect()): Result =
    TimeoutGuard.run(spark, timeoutMinutes) {
      var r = spark.read.format("jdbc")
        .option("url", url)
        .option("query", SqlRunner.normalize(SqlRunner.resolve(sql)))
        // server-side statement timeout — the reference's semantics
        // (`SET statement_timeout`, operators.py:76), minutes→seconds
        .option("queryTimeout", (timeoutMinutes * 60L).toString)
      partitioning.foreach { p =>
        r = r.option("partitionColumn", p.column)
          .option("lowerBound", p.lower.toString)
          .option("upperBound", p.upper.toString)
          .option("numPartitions", p.numPartitions.toString)
      }
      connectionProperties.forEach((k, v) => r = r.option(k.toString, v.toString))
      val df = r.load()
      val effective = dialect.copy(hasHeader = hasHeader, compression = compression)
      Result(csvFilePath, PgCsv.writeSingleFile(df, csvFilePath, effective))
    }

  def run(spark: SparkSession,
          sql: String,
          csvFilePath: String,
          parameters: Map[String, Any] = Map.empty,
          hasHeader: Boolean = true,              // operators.py:29
          compression: Option[String] = None,     // operators.py:30-31
          timeoutMinutes: Long = TimeoutGuard.DefaultTimeoutMinutes,
          dialect: CsvDialect = CsvDialect()): Result =
    TimeoutGuard.run(spark, timeoutMinutes) {
      val df = SqlRunner.run(spark, sql, parameters)
      val effective = dialect.copy(hasHeader = hasHeader, compression = compression)
      val rows = PgCsv.writeSingleFile(df, csvFilePath, effective)
      Result(csvFilePath, rows)
    }
}
