package graft.operators

/** SQL identifier quoting — E9.
  *
  * Mirrors the reference exactly: double-quote each identifier, escape
  * embedded `"` by doubling (`/root/reference/src/airflow_postgres_csv/
  * operators.py:194-198`), and quote dotted table names per-part
  * (`operators.py:200-202`). Like the reference, a literal dot inside a name
  * is not supported (the split is blind).
  */
object Identifiers {
  def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  def quoteQualified(tableName: String): String =
    tableName.split('.').map(quote).mkString(".")

  /** `(col_a, col_b)` clause used for explicit column mapping — E10
    * (`operators.py:204-208`). */
  def columnList(columns: Seq[String]): String =
    columns.map(quote).mkString("(", ", ", ")")
}
