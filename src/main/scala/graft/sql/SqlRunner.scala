package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL front door — the Spark-native analog of the reference's
  * query-execution path, where user SQL text is forwarded to the database
  * engine verbatim (`/root/reference/src/airflow_postgres_csv/operators.py:80`).
  *
  * Owns the three text-level behaviors the reference implements itself:
  *  - E5 statement normalization: strip whitespace + trailing `;`
  *    (`operators.py:70`) — required there to embed in `COPY (...)`, kept here
  *    for drop-in compatibility.
  *  - E3 SQL-from-file: a statement ending in `.sql` is read from disk
  *    (`operators.py:35-39,62-67`).
  *  - E4 named-parameter binding: reference binds `%(name)s` params client-side
  *    via `cursor.mogrify` (`operators.py:77`); Spark ≥3.4 binds `:name` params
  *    in Catalyst (`NameParameterizedQuery`) — same safety property (values are
  *    bound as literals, never string-interpolated).
  */
object SqlRunner {

  /** `operators.py:70` — whitespace + trailing-semicolon strip. */
  def normalize(sql: String): String = {
    val t = sql.trim
    (if (t.endsWith(";")) t.dropRight(1) else t).trim
  }

  /** `operators.py:62-67` — `.sql` suffix means "load statement from file".
    *
    * `searchPaths` mirrors the reference's `template_ext` resolution
    * (`operators.py:35-39`), where a RELATIVE `.sql` path is looked up
    * against the DAG folder + `template_searchpath` directories in order.
    * An absolute path, or a relative path that resolves from the working
    * directory, behaves exactly as before; search dirs are consulted only
    * when neither does. */
  def resolve(sqlOrPath: String, searchPaths: Seq[String] = Nil): String =
    if (sqlOrPath.trim.toLowerCase.endsWith(".sql")) {
      val p = sqlOrPath.trim
      val direct = new java.io.File(p)
      val target =
        if (direct.isAbsolute || direct.isFile) direct
        else searchPaths.iterator
          .map(dir => new java.io.File(dir, p))
          .find(_.isFile)
          .getOrElse(direct) // keep the original path in the error message
      val src = scala.io.Source.fromFile(target)
      try src.mkString finally src.close()
    } else sqlOrPath

  /** Execute SQL text (or a `.sql` file path) with optional named parameters. */
  def run(spark: SparkSession, sqlOrPath: String,
          params: Map[String, Any] = Map.empty,
          searchPaths: Seq[String] = Nil): DataFrame = {
    val sql = normalize(resolve(sqlOrPath, searchPaths))
    if (params.isEmpty) spark.sql(sql) else spark.sql(sql, params)
  }
}
