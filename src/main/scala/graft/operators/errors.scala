package graft.operators

/** Typed error hierarchy — the analog of the reference's use of
  * `AirflowException` for input validation
  * (`/root/reference/src/airflow_postgres_csv/operators.py:153-154`). */
class GraftException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Missing input file (reference `operators.py:153-154`; raised by the CSV
  * and JSONL import paths alike). */
class MissingInputException(path: String)
  extends GraftException(s"input file not found: $path")

/** Query exceeded its timeout (reference `statement_timeout`,
  * `operators.py:76,174`). */
class GraftTimeoutException(minutes: Long)
  extends GraftException(s"query exceeded timeout of $minutes minutes")
