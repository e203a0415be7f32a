package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType/DoubleType)` columns, built from
  * codegen-friendly higher-order functions (`zip_with`/`aggregate`) — no UDFs,
  * so Catalyst keeps these inside the optimized plan (SURVEY.md §2c X3).
  *
  * All fold left-to-right in double precision: deterministic, and identical
  * to DuckDB's list_* fold order where an oracle compares.
  */
object Vectors {

  /** Σ aᵢ·bᵢ — per-row, no shuffle. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) ∈ [-1, 1]; NULL-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /** ‖a − b‖₂ */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** a / ‖a‖₂ (unit-normalize once, then cosine == dot — cheaper at scale). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x.cast("double") / n)
  }
}
