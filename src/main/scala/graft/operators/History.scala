package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SCD2-style historization — turn a stream/log of per-entity OBSERVATIONS
  * into validity INTERVALS: one row per (key, consecutive distinct state),
  * with `valid_from` (the version at which the state was first observed),
  * `valid_to` (the version of the NEXT state change, NULL while current)
  * and `is_current`. The warehouse-side complement of [[Dedup.keepLatest]]:
  * keepLatest answers "what is the state NOW", historize answers "what was
  * the state WHEN" — the slowly-changing-dimension build every CDC ingest
  * needs before point-in-time joins ([[AsofJoin]]) can be trusted.
  *
  * Contract mirrors keepLatest: `versionCols` must totally order
  * observations within a key (append a unique id when the timestamp alone
  * can tie); consecutive observations with an UNCHANGED tracked state
  * collapse into one interval (NULL-safe comparison, so NULL→value and
  * value→NULL transitions both open a new interval, and a NULL-state
  * first observation still opens one). The emitted `valid_from`/`valid_to`
  * are the FIRST version column's values; the full version tuple of the
  * opening observation rides along as `from_<col>` columns for a total
  * output order.
  *
  * Shape: ONE hash shuffle on the key + ONE per-key sort feeding two
  * window passes (the change-detection lag and the interval-closing lead
  * share the same partitioning and ordering, so Catalyst reuses the
  * exchange and sort — no second shuffle). Per-key history rides a single
  * task, the standard SCD regime: keys are many, histories bounded. At
  * 100 TB nothing is driver-side and nothing is quadratic; the output is
  * at most the input. */
object History {

  def historize(df: DataFrame, keyCols: Seq[String], versionCols: Seq[String],
                stateCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(versionCols.nonEmpty, "versionCols must be non-empty")
    require(stateCols.nonEmpty, "stateCols must be non-empty")
    val overlap = stateCols.toSet & (keyCols.toSet ++ versionCols.toSet)
    require(overlap.isEmpty,
      s"stateCols must not repeat key/version columns: $overlap")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(col): _*)
    val state = struct(stateCols.map(col): _*)
    val changed = row_number().over(w) === 1 ||
      !(lag(state, 1).over(w) <=> state)
    val opens = df
      .withColumn("__chg", changed)
      .where(col("__chg"))
    // same key partitioning + version ordering: the exchange and sort are
    // reused (the filter is flow-through), so the lead costs no shuffle
    val out = opens
      .withColumn("valid_to", lead(col(versionCols.head), 1).over(w))
      .select(
        keyCols.map(col) ++
          stateCols.map(col) ++
          Seq(col(versionCols.head).as("valid_from")) ++
          versionCols.map(c => col(c).as(s"from_$c")) ++
          Seq(col("valid_to"),
            col("valid_to").isNull.as("is_current")): _*)
    out
  }
}
