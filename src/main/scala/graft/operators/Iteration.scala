package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared iteration-boundary cut for the fixed-point operators
  * ([[Graph.pagerank]], [[BradleyTerry.fit]]).
  *
  * `localCheckpoint(eager = true)` truncates LINEAGE but inherits the
  * checkpointed plan's cost statistics, and Catalyst's size-only join
  * estimate is the PRODUCT of the children's `sizeInBytes` — so an
  * iteration of the shape `state ⋈ edges ⋈ state` doubles the stat's
  * BigInteger bit-length every pass. The numbers stay mathematically
  * harmless but the arithmetic does not: by ~iteration 20 the planner is
  * multiplying multi-megabit integers and a millisecond job pays minutes
  * of driver time (observed: 3-minute planning stalls at 30 iterations on
  * a 7-row fixture).
  *
  * The cut re-roots the checkpointed RDD as a fresh leaf via the public
  * `createDataFrame(RDD[Row], schema)` — statistics reset to the
  * scan-independent default, plans stay iteration-depth-independent in
  * both size AND stat magnitude. The row conversion is narrow per-row work
  * on the already-materialized checkpoint (no extra job, no shuffle);
  * iterative state frames here are (key, double) rows, so the cost is
  * noise against the iteration's own shuffle. Explicit `broadcast()`
  * hints are unaffected (only AUTO-broadcast selection loses the size
  * signal, and the iterating operators hint every broadcast they want). */
private[operators] object Iteration {

  /** Eagerly materialize `df` and return it as a fresh statistics leaf. */
  def cut(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
