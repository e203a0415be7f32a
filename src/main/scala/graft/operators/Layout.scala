package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning: Z-order (Morton) multi-column
  * clustering. At 100 TB the dominant cost of a selective two-column query is
  * the files it CANNOT skip — range-partitioning and sorting by the
  * interleaved Z-value gives every output file a tight bounding box in BOTH
  * dimensions, so parquet min/max stats prune files for predicates on either
  * column (a single-column sort only prunes its own column).
  *
  * The Z-value is composed entirely of builtin bitwise expressions
  * (shift/and/xor — the standard magic-number bit spread), so it stays inside
  * WholeStageCodegen; no UDF, no custom Expression needed.
  */
object Layout {

  /** Spread the low 32 bits of a non-negative long across the even bit
    * positions of a 64-bit value (Morton encoding half-step). */
  def spreadBits(x: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8,  0x00FF00FF00FF00FFL),
      (4,  0x0F0F0F0F0F0F0F0FL),
      (2,  0x3333333333333333L),
      (1,  0x5555555555555555L))
    masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (v, (s, m)) => v.bitwiseXOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }
  }

  /** 64-bit Z-order value interleaving two non-negative 32-bit coordinates:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Inputs must be
    * non-negative (map signed domains with an offset first); values above
    * 2^32-1 are truncated to their low 32 bits. */
  def zOrder2(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))

  /** Rewrite `df` into `partitions` range-partitioned, internally-sorted
    * slices of Z-order space over (`colX`, `colY`). Write the result with
    * `.write.parquet(...)` and both columns become file-prunable. */
  def clusterByZOrder(df: DataFrame, colX: String, colY: String,
                      partitions: Int): DataFrame = {
    val z = zOrder2(col(colX), col(colY)).as("__graft_zval")
    df.withColumn("__graft_zval", z)
      .repartitionByRange(partitions, col("__graft_zval"))
      .sortWithinPartitions("__graft_zval")
      .drop("__graft_zval")
  }

  /** DuckDB spelling of [[spreadBits]]/[[zOrder2]] for oracle SQL: the same
    * shift/xor/mask chain in the engine-shared integer semantics (64-bit
    * signed, decimal literals). */
  def zOrder2Sql(x: String, y: String): String = {
    def spread(e: String): String = {
      val masks = Seq(
        (16, 281470681808895L),
        (8,  71777214294589695L),
        (4,  1085102592571150095L),
        (2,  3689348814741910323L),
        (1,  6148914691236517205L))
      masks.foldLeft(s"(CAST($e AS BIGINT) & 4294967295)") {
        case (v, (s, m)) => s"(xor($v, ($v << $s)) & $m)"
      }
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }
}
