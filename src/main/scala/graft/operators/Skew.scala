package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md "salting for skew").
  *
  * AQE's skew-join splitting (enabled in [[graft.GraftSession]]) handles most
  * runtime skew; explicit salting remains the tool when a single hot key
  * exceeds what one task can hold — at 100 TB a power-law key (the empty
  * document, the null-ish user id) otherwise pins one executor while 999 idle.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side scatters each row into one of
    * `salt` sub-keys; the small side replicates `salt` times so every
    * sub-key finds its match. One shuffle either way — the cost is
    * `salt × |small|`, the win is hot keys split across `salt` tasks.
    *
    * Salt assignment is deterministic (hash of the whole row's partition id +
    * a per-row counter via monotonically_increasing_id), so repeated runs
    * place rows identically. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N heavy-hitter keys with their frequencies — the diagnostic used to
    * decide whether salting is needed (one aggregation pass). */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
}
