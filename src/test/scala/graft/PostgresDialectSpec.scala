package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.jdbc.JdbcDialects
import graft.operators.Identifiers

/** Postgres-DIALECT pins for the SQL text the transfer operators generate
  * (E9 quoting, E11 truncate). The JDBC round-trip itself is proven
  * against embedded Derby in TransferOpsSpec; no Postgres wire is
  * available in the sandbox, so this spec checks the generated text
  * against a SECOND, independent implementation of the Postgres rules —
  * Spark's own `PostgresDialect` (resolved through the public
  * `JdbcDialects.get` registry) — plus literal expected strings mirroring
  * the reference's behavior (`/root/reference/src/airflow_postgres_csv/
  * operators.py:194-208`): double-quote each part, escape embedded `"` by
  * doubling, split dotted names blindly on `.`. */
class PostgresDialectSpec extends AnyFunSuite {

  private val dialect = JdbcDialects.get("jdbc:postgresql://localhost:5432/db")

  test("per-part quoting matches Spark's PostgresDialect.quoteIdentifier") {
    val idents = Seq("plain", "MixedCase", "has space", "wei\"rd", "\"\"", "с юникодом")
    idents.foreach { id =>
      assert(Identifiers.quote(id) == dialect.quoteIdentifier(id),
        s"quote('$id') diverges from Spark's Postgres dialect")
    }
  }

  test("qualified quoting matches the reference's literal output") {
    // operators.py:200-202 — split on '.', quote each part
    assert(Identifiers.quoteQualified("myschema.mytable") == "\"myschema\".\"mytable\"")
    assert(Identifiers.quoteQualified("mytable") == "\"mytable\"")
    // operators.py:196-197 — embedded quote doubles
    assert(Identifiers.quoteQualified("s.we\"ird") == "\"s\".\"we\"\"ird\"")
    // per-part parity with the dialect on the same split
    val parts = "myschema.mytable".split('.')
    assert(Identifiers.quoteQualified("myschema.mytable") ==
      parts.map(dialect.quoteIdentifier).mkString("."))
  }

  test("truncate SQL: Spark's Postgres dialect embeds our quoted name verbatim") {
    // E11 rides Spark's JDBC `truncate=true`, which issues
    // dialect.getTruncateQuery(dbtable) — the reference issues
    // `TRUNCATE "schema"."table"` (operators.py:175-177); Postgres treats
    // `TRUNCATE TABLE ONLY x` identically for ordinary (non-inheriting)
    // tables. The pin: the statement targets exactly our quoted name and
    // never cascades by default.
    val quoted = Identifiers.quoteQualified("myschema.my\"tbl")
    val sql = dialect.getTruncateQuery(quoted)
    assert(sql.startsWith("TRUNCATE TABLE"), s"unexpected truncate text: $sql")
    assert(sql.endsWith(quoted), s"truncate must target the quoted name: $sql")
    assert(!sql.toUpperCase.contains("CASCADE"),
      "default truncate must not cascade — the reference never does")
    assert(dialect.isCascadingTruncateTable().contains(false))
  }

  test("column-list clause matches the reference's literal output") {
    // operators.py:204-208 — `(cols...)` each quoted
    assert(Identifiers.columnList(Seq("col_a", "co\"l_b")) ==
      "(\"col_a\", \"co\"\"l_b\")")
  }
}
