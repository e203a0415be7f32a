package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines (SURVEY.md §2c X1/X2).
  *
  * Scale notes: exact dedup is a hash shuffle on the key columns — at 100 TB
  * prefer `keyCols` that are already a stable content hash (see `withContentHash`)
  * so the shuffle moves 8-byte keys + row ids, not document bodies.
  */
object Dedup {

  /** Exact dedup, deterministic: keep the row with the smallest `tieBreaker`
    * per key group. Unlike `dropDuplicates` (which keeps an arbitrary row and
    * is therefore unstable across runs/partitionings), this is reproducible —
    * a requirement for training-data lineage. One shuffle on `keyCols`. */
  def exactKeepFirst(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Stable 64-bit content hash column (xxhash64). At scale, dedup on this
    * instead of the raw text: the shuffle key shrinks from ~KBs to 8 bytes. */
  def withContentHash(df: DataFrame, textCol: String, hashCol: String = "content_hash"): DataFrame =
    df.withColumn(hashCol, xxhash64(col(textCol)))

  /** Fuzzy dedup, final stage: collapse a near-duplicate PAIR list (any of
    * [[NearDup]]'s generators) into clusters via distributed connected
    * components, and keep exactly one representative per cluster — the
    * minimum id, so the choice is deterministic and partitioning-invariant.
    *
    * Returns `df` rows whose id is its cluster's minimum (uniques survive as
    * their own singleton cluster). The pair graph's transitive closure is the
    * right cluster semantics: A~B and B~C must collapse to ONE kept doc even
    * when A~C was never emitted as a pair.
    *
    * Cost beyond the pair pass: O(log) rounds of narrow (long, long)
    * shuffles ([[ConnectedComponents]]) plus one semi-join of `df` against
    * the kept-id set — document bodies never enter the iteration. */
  def keepClusterRepresentatives(df: DataFrame, idCol: String,
                                 pairs: DataFrame,
                                 pairCol1: String = "id_1",
                                 pairCol2: String = "id_2"): DataFrame = {
    val comp = ConnectedComponents.components(pairs, pairCol1, pairCol2)
    val drop = comp.where(col("node") =!= col("component"))
      .select(col("node").as("__graft_drop_id"))
    df.join(drop, col(idCol).cast("long") === col("__graft_drop_id"), "left_anti")
  }
}
