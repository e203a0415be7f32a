package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the final stage of
  * fuzzy deduplication at scale. MinHash/LSH and embedding-cosine passes
  * (see [[NearDup]]) emit *pairs*; actual dedup needs *clusters* (a duplicate
  * group is the transitive closure of its pairs) and one representative per
  * cluster. This operator closes that gap.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * shared-nothing CC algorithm. Each round is two phases; each phase is one
  * `groupBy(min)` plus one equi-join, both keyed by an 8-byte node id — no
  * adjacency lists are ever materialized per node beyond Spark's own
  * aggregation state, so a 10^11-edge pair graph shuffles only narrow
  * (long, long) rows. Rounds converge in O(log^2 n) (in practice a handful:
  * near-dup clusters are almost always stars/cliques of tiny diameter).
  *
  * Scale notes:
  *  - per-round results are `localCheckpoint`ed to truncate lineage (on a
  *    real cluster prefer `spark.sparkContext.setCheckpointDir` + reliable
  *    `checkpoint`; local mode has no reliable store);
  *  - convergence is detected by a constant-size checksum aggregate
  *    (count + two independent xxhash64 sums of the canonical edge set) —
  *    one driver-side row per round, never a driver-side edge list;
  *  - the hot keys of a power-law pair graph (a boilerplate dup-cluster hub)
  *    are exactly the case the algorithm is designed for: each round strictly
  *    shrinks tree heights, and AQE handles the transient groupBy skew.
  */
object ConnectedComponents {

  /** (node, component) for every node incident to an edge; `component` is the
    * smallest node id reachable from `node` (so a component is named by its
    * minimum member). Self-loops and duplicate/reversed edges are tolerated.
    *
    * @param edges  DataFrame with two INTEGRAL id columns — the iteration
    *               shuffles primitive longs by design. Non-integral ids are
    *               rejected at plan time (a silent cast would null them out
    *               and return an empty forest that looks like "no
    *               clusters"); hash such ids to longs first, as
    *               [[Dedup.keepClusterRepresentatives]] does.
    * @param maxIter hard cap on large+small-star rounds (a convergence
    *                backstop; the checksum loop normally exits far earlier)
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 50): DataFrame = {
    requireIntegralIds(edges, srcCol, dstCol)
    // Checkpoint the normalized edge list ONCE: the caller's edge lineage is
    // typically the expensive part (an LSH band join, a within-cell cosine
    // pass), and deriving `nodes` and `e` from the raw plan executed it
    // twice before the first round even started — measured as the dominant
    // cost of the x30 gate. One narrow (long, long) materialization, then
    // everything downstream reads the checkpoint.
    val raw = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
      .localCheckpoint(true)
    // Every node MENTIONED in the edge list appears in the output — a node
    // whose only edge is a self-loop is a singleton, not silently absent.
    val nodes = raw.select(col("u").as("node"))
      .union(raw.select(col("v").as("node")))
      .distinct()
    var e = raw
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    var prev = checksum(e)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      e.unpersist(false)
      e = next
      val cs = checksum(e)
      converged = cs == prev
      prev = cs
      it += 1
    }

    // Fixed point is a star forest: every edge is (member, root) with
    // root < member. Join back to the mentioned-node universe so self-loop
    // singletons come out as their own component.
    val stars = e.select(col("u").as("node"), col("v").as("component"))
    nodes.join(stars, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  /** [[components]] extended to a node table: nodes with no edge become
    * singleton components of themselves (a dedup pass must keep uniques). */
  def componentsOf(nodes: DataFrame, idCol: String,
                   edges: DataFrame, srcCol: String, dstCol: String,
                   maxIter: Int = 50): DataFrame = {
    requireIntegralIds(nodes, idCol)
    val comp = components(edges, srcCol, dstCol, maxIter)
    nodes.select(col(idCol).cast("long").as("node")).distinct()
      .join(comp, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
  }

  /** Fail-loud input guard: the silent alternative (cast → NULL → row
    * dropped) returns an empty/partial forest indistinguishable from "no
    * clusters found". */
  private def requireIntegralIds(df: DataFrame, cols: String*): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    cols.foreach { c =>
      // resolve through the analyzer (case-insensitive, matching how the
      // selects below resolve), not a case-sensitive schema field lookup
      val t = df.select(col(c)).schema.head.dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
        s"connected components needs an integral id column; '$c' is " +
          s"${t.simpleString} — xxhash64 non-integral ids to longs first " +
          "(see Dedup.keepClusterRepresentatives)")
    }
  }

  /** Large-star: for each node u, link every *larger* neighbor to the
    * minimum of u's closed neighborhood. Two narrow shuffles on `u`. */
  private def largeStar(e: DataFrame): DataFrame = {
    val g = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = g.groupBy("u")
      .agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    g.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: direct edges large→small; for each node a, link its smaller
    * neighbors (and a itself) to their minimum. */
  private def smallStar(e: DataFrame): DataFrame = {
    val h = e.select(greatest(col("u"), col("v")).as("a"),
                     least(col("u"), col("v")).as("b"))
      .where(col("a") =!= col("b"))
    val mins = h.groupBy("a").agg(min("b").as("m"))
    h.join(mins, "a")
      .where(col("b") =!= col("m"))
      .select(col("b").as("u"), col("m").as("v"))
      .union(mins.select(col("a").as("u"), col("m").as("v")))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
  }

  /** Constant-size convergence fingerprint of the canonical edge set: count
    * plus two independently-seeded xxhash64 XOR-folds (XOR is order-
    * independent and cannot overflow under ANSI mode; the edge set is
    * distinct, so XOR cancellation needs a hash collision). One 3-column row
    * to the driver per round. */
  private def checksum(e: DataFrame): (Long, Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(u, v))").as("h1"),
      expr("bit_xor(xxhash64(v, u, 1337))").as("h2")
    ).head()
    (r.getLong(0),
     if (r.isNullAt(1)) 0L else r.getLong(1),
     if (r.isNullAt(2)) 0L else r.getLong(2))
  }
}
