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
