package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming layer (SURVEY.md §2b "Streaming", §7.4).
  *
  * The reference is batch-only — one `COPY` per Airflow task run
  * (`/root/reference/src/airflow_postgres_csv/operators.py:61,152`);
  * incremental behavior comes from re-running the DAG on templated paths
  * (`operators.py:35-39`). The Spark-native upgrade is a first-class
  * streaming layer over the same `events` shape: file-source streams,
  * event-time windows + watermarks for late data, session windows, arbitrary
  * state, and a `foreachBatch` sink that reuses the batch E2 path — so the
  * batch query inventory (Q32 is the batch anchor) carries over unchanged.
  *
  * Scale notes: file-source streaming scales by `maxFilesPerTrigger`;
  * windowed aggregation state is partitioned by group key across executors;
  * watermarks bound state size — without one, 100 TB of history accumulates.
  */
object EventStreams {

  /** Event shape after normalization (ts is a proper timestamp). */
  val eventSchema: StructType = new StructType()
    .add("event_id", "long").add("ts", "timestamp_ntz").add("user_id", "long")
    .add("event_type", "string").add("value", "double").add("props", "string")

  /** File-source stream of event parquet (one file per micro-batch by
    * default — deterministic for tests; raise for throughput). */
  def readEvents(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      // watermarks require TIMESTAMP (LTZ); session tz is pinned UTC so the
      // cast from the on-disk NTZ values is value-preserving
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Stream-stream interval join — correlate two live event streams (e.g.
    * impressions with their conversions) within a time bound. BOTH sides
    * carry watermarks and the join condition carries the interval, so Spark
    * can bound buffered state on each side: a left row is held only until
    * the right watermark passes `ts + maxDelay`, then dropped — without the
    * interval, stream-stream state would grow forever (state eviction under
    * the bound is pinned via state-store metrics in StreamingSpec).
    *
    * `joinType` "inner" (default): a pair emits once both sides arrive
    * (within watermark bounds). "left_outer": additionally, a left row whose
    * interval the watermark seals WITHOUT a match emits exactly once with
    * null right columns — for correlations where absence is the signal
    * (impressions that never converted). The emission is watermark-driven:
    * it appears only once the watermark passes `l_ts + maxDelay`, the
    * earliest moment absence is decidable on an unbounded stream.
    * "full_outer" seals BOTH sides: unmatched rights (conversions with no
    * impression — attribution holes) additionally emit once with null left
    * columns, after the watermark proves no left row can still pair (its
    * candidate window is `[r_ts − maxDelay, r_ts]`, so the seal point is
    * the right row's own timestamp plus the watermark delay).
    *
    * Output: one row per (left, right) pair within `[0, maxDelay]` of each
    * other on the same `keyCol` (plus the null-padded unmatched rows the
    * outer variants seal). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   maxDelay: String = "10 minutes",
                   watermark: String = "10 minutes",
                   joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "full_outer")(joinType),
      s"joinType must be inner, left_outer, or full_outer, got $joinType")
    val l = left.withWatermark("ts", watermark)
      .select(col(keyCol).as("k"), col("ts").as("l_ts"),
        col("event_id").as("l_id"), col("event_type").as("l_type"))
    val r = right.withWatermark("ts", watermark)
      .select(col(keyCol).as("r_k"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("event_type").as("r_type"))
    l.join(r,
      col("k") === col("r_k") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"),
      joinType)
      // full_outer's sealed unmatched-RIGHT rows carry their key only in
      // r_k (the left side is all-null) — coalesce is the identity for
      // the inner/left_outer faces
      .select(coalesce(col("k"), col("r_k")).as(keyCol),
        col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Stream-static dimension enrichment — the stateless workhorse of every
    * ingest path: each streaming row joins the (slowly-changing, executor-
    * cached) dimension frame as of THIS micro-batch; Spark re-plans the
    * static side per batch, so a dim refresh is picked up without
    * restarting the query. No watermark, no join state — unlike
    * [[intervalJoin]], nothing is buffered, so this composes freely under
    * any output mode. `broadcast()` is applied to the static side
    * explicitly: at 100 TB of stream the dim must never become the shuffle
    * side of a SortMergeJoin inside every micro-batch.
    *
    * `left_outer` (stream side preserved) keeps un-enrichable rows with
    * NULL dim columns — the honest default for a dim that can lag the
    * stream; `inner` drops them. Both are stateless and emit in the same
    * micro-batch the row arrives. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    keyCols: Seq[String],
                    joinType: String = "left_outer"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(joinType == "inner" || joinType == "left_outer",
      s"joinType must be inner or left_outer, got $joinType")
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      keyCols, joinType)
  }

  /** The filtering complement of [[enrichWithDim]]: drop every streaming
    * row whose key appears in the static frame — blocklist filtering at
    * ingest (banned domains, opted-out users, already-processed ids). A
    * stream-static LEFT ANTI join: stateless, broadcast, re-planned per
    * micro-batch so a blocklist refresh takes effect without a restart;
    * rows emit exactly once, in their arrival batch. Unlike the stateful
    * [[dedupEvents]] this keeps NO state — the set membership lives in
    * the (refreshable) static side, which is the right shape when the
    * exclusion list is maintained OUTSIDE the stream. */
  def excludeByDim(stream: DataFrame, dim: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      keyCols, "left_anti")
  }

  /** Tumbling event-time window counts — the streaming form of Q32.
    * The watermark bounds both late-data acceptance and state retention. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("w.start").as("h"), col("event_type"), col("n"), col("sv"))

  /** Sliding windows (overlapping buckets). */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
                    slide: String = "30 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"))

  /** Session windows: activity bursts per user separated by `gap` of
    * inactivity — `session_window` keeps state per open session only. */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sv"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sv"))

  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Arbitrary stateful processing (`mapGroupsWithState`): running per-user
    * totals across micro-batches — the pattern for custom state machines the
    * built-in windows can't express. State lives in the state store,
    * partitioned by key; use with Update output mode. */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events.select("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events; var v = prev.total_value
          rows.foreach { r => n += 1; v += r._2 }
          val next = UserRunning(uid, n, v)
          state.update(next)
          next
      }
  }

  final case class CusumPoint(key: String, ord: Long, value: Double,
                              target: Double, allow: Double, thresh: Double)
  final case class CusumState(lastOrd: Long, pUp: Double, mUp: Double,
                              pDn: Double, mDn: Double)
  final case class CusumFlag(key: String, ord: Long, value: Double,
                             cusum_up: Double, cusum_dn: Double,
                             alarm_up: Boolean, alarm_dn: Boolean)

  /** Streaming CUSUM drift monitor — the online form of
    * [[graft.operators.ChangePoint.cusum]], and the reason its closed form
    * matters twice: `S⁺_i = P_i − min(0, min_{j≤i} P_j)` is exactly
    * incrementalizable, so the per-key state is FOUR doubles + the last
    * order key (prefix sum and running min per side), O(1) however long
    * the series runs — no window buffer, no replay. Each input point emits
    * exactly one flag row whose statistics are FINAL (past rows are never
    * revised), so Append mode is the natural sink and the batch operator
    * is bit-identical on the same ordered series (pinned in
    * StreamingCusumSpec).
    *
    * Ordering contract: each key's series must arrive in `ord` order
    * ACROSS micro-batches (within a batch the fold sorts); a stale point
    * fails LOUDLY rather than corrupting the recursion — the same
    * trade as [[dedupEvents]], with batch `ChangePoint.cusum` as the
    * exact out-of-order backstop. Input columns must match [[CusumPoint]]
    * (`target`/`allow`/`thresh` ride each row, constant per key). */
  def cusumMonitor(spark: SparkSession,
                   points: DataFrame): Dataset[CusumFlag] = {
    import spark.implicits._
    points.as[CusumPoint]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[CusumPoint],
         state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(Long.MinValue,
            0.0, Double.PositiveInfinity, 0.0, Double.PositiveInfinity))
          val out = rows.toSeq.sortBy(_.ord).map { p =>
            require(p.ord > st.lastOrd,
              s"cusumMonitor: out-of-order ord ${p.ord} ≤ ${st.lastOrd} " +
                s"for key $key — deliver each key's series in order " +
                "(batch ChangePoint.cusum is the exact backstop)")
            val pUp = st.pUp + (p.value - p.target - p.allow)
            val mUp = math.min(st.mUp, pUp)
            val pDn = st.pDn + (p.target - p.value - p.allow)
            val mDn = math.min(st.mDn, pDn)
            st = CusumState(p.ord, pUp, mUp, pDn, mDn)
            val up = pUp - math.min(mUp, 0.0)
            val dn = pDn - math.min(mDn, 0.0)
            CusumFlag(key, p.ord, p.value, up, dn,
              up > p.thresh, dn > p.thresh)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Streaming per-window value histogram — the INGEST half of the x39 PSI
    * drift monitor: each row bins map-only against the broadcast-literal
    * edge fold (the SAME value-split rule as `Profiling.distributionDrift`
    * / `Selection.assignQuantileBuckets`: x ≥ edge → higher bin; edges are
    * fitted BATCH-side on the reference corpus — a model artifact, like
    * IVF centroids), then a tumbling-window streaming count keyed
    * (window, bucket). State is ≤ |edges|+1 rows per OPEN window, the
    * aggregation partial-aggregates map-side before the state shuffle, and
    * Append emits each window's histogram exactly once when the watermark
    * seals it — so the PSI read over any sealed window is FINAL on
    * emission. PSI assembly (reference join + eps-clamped terms) happens
    * batch-side over the k-row sink; the stream never carries more than
    * the histogram. NULL values are excluded like the batch form — and
    * since Catalyst pushes that filter BELOW the watermark node (it does
    * not reference the event-time column), a NULL-valued row is NOT
    * guaranteed to advance event time: watermark-driving sentinel rows
    * must carry a non-NULL value (their own far-future window simply
    * never seals, so they can't contaminate the sink). */
  def binnedHistogram(stream: DataFrame, valueCol: String,
                      edges: Seq[Double], window_ : String,
                      watermark: String): DataFrame = {
    require(edges.nonEmpty, "binnedHistogram needs at least one bin edge")
    val v = col(valueCol).cast("double")
    val bucket = edges.foldLeft(lit(1)) { (acc, t) =>
      acc + when(v >= t, 1).otherwise(0)
    }
    stream.withWatermark("ts", watermark)
      .where(v.isNotNull)
      .groupBy(window(col("ts"), window_).as("w"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n_cur"))
      .select(col("w.start").as("ws"), col("bucket"), col("n_cur"))
  }

  /** Streaming exact dedup — the ingest-time form of the X1 batch operator:
    * keep the first arrival per key across micro-batches. The watermark
    * bounds the dedup state (keys older than the watermark are evicted), so
    * a duplicate arriving later than `watermark` after the original is NOT
    * suppressed — the deliberate state/recall trade every streaming dedup
    * makes; the batch `Dedup.exactKeepFirst` is the exact backstop. */
  def dedupEvents(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.toIndexedSeq)

  /** Streaming keep-latest — the continuously-maintained "current state per
    * key" table (latest event per user, newest crawl version per URL): the
    * streaming form of [[graft.operators.Dedup.keepLatest]], and literally
    * a 1:1 delegation to it — the same `graft_latest` aggregate
    * ([[graft.plans.LatestAggregate]], a sort-free keep-max-row
    * TypedImperativeAggregate) runs as a STATEFUL streaming aggregation, so
    * streaming/batch parity holds by construction (pinned in StreamingSpec,
    * including out-of-order delivery: an older version arriving later never
    * displaces the state's newer row, because max_by folds the new batch
    * into the stored maximum).
    *
    * State is ONE narrow row per key — bounded by key cardinality, never by
    * stream length. Emit with `OutputMode.Update` (each micro-batch emits
    * only keys whose latest row changed) or `Complete` (re-emit the whole
    * state table); `Append` is unsupported by construction — a key's latest
    * row is never final. Out-of-order safety is the aggregate's merge
    * semantics: `graft_latest` folds each micro-batch into the stored
    * maximum-version row, so an older version arriving later never
    * displaces a newer one. */
  def latestPerKey(stream: DataFrame, keyCols: Seq[String],
                   versionCols: Seq[String]): DataFrame =
    graft.operators.Dedup.keepLatest(stream, keyCols, versionCols)

  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                                 n_events: Long)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class OpenSessions(sessions: List[OpenSession])

  /** Custom sessionization via `flatMapGroupsWithState`: emits each session
    * WHEN IT CLOSES — zero-to-many outputs per group invocation, the shape
    * `mapGroupsWithState` (exactly one output) cannot express.
    *
    * Semantics match batch `session_window` under the watermark contract:
    * state holds ALL of a user's open sessions (not just the newest), new
    * events fold in by interval-merge with gap — so out-of-order events
    * older than the newest session's window start their OWN session and
    * merge with adjacent latecomers, exactly as batch would group them,
    * instead of degenerating to singletons. A session closes only when the
    * WATERMARK passes `last + gap` (no event that could still extend it can
    * arrive — rows below the watermark are dropped before the stateful op),
    * either on a data batch or via the event-time timeout, so dangling
    * sessions drain instead of living in the state store forever.
    *
    * State per user is a short list of (start, last, n) triples — more than
    * one entry only while out-of-order data is in flight inside the
    * watermark window — partitioned by key across executors; the watermark
    * bounds state size and output latency at 100 TB-stream scale.
    *
    * Precision: session bounds are tracked in event-time MICROseconds
    * (`start_us`/`end_us` = `unix_micros` of the first/last event) — the
    * same precision batch `session_window` decides merges at — so the
    * sealed sessions hash-match the batch spelling bit-for-bit on
    * microsecond-resolution data (gated end-to-end as x79). The merge is
    * STRICT (`start < last + gap`): an event exactly `gap` after a
    * session's last event starts a NEW session, exactly as batch
    * `session_window` treats non-overlapping [t, t+gap) intervals. Only
    * the watermark itself is millisecond-grained (Spark's contract); the
    * seal/timeout arithmetic converts conservatively. */
  def closedUserSessions(spark: SparkSession, events: DataFrame,
                         gapMs: Long = 30L * 60 * 1000,
                         watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapMs * 1000L
    // the watermarked TS column must survive into the grouped Dataset — a
    // projection that drops it detaches the watermark from the stateful op
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("tus"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[OpenSessions]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val existing = state.getOption.map(_.sessions).getOrElse(Nil)
          val merged =
            if (state.hasTimedOut) existing
            else {
              // fold the batch's events in as singleton sessions, then
              // interval-merge with gap — the same merge batch
              // session_window performs ([t, t+gap) intervals merge iff
              // they OVERLAP, so the comparison is strict). Existing
              // sessions are internally gap-consistent, so one sorted
              // sweep suffices.
              val pts = rows.map(r => OpenSession(r._3, r._3, 1L)).toList
              val all = (existing ++ pts).sortBy(s => (s.start, s.last))
              val out = scala.collection.mutable.ListBuffer.empty[OpenSession]
              all.foreach { s =>
                out.lastOption match {
                  case Some(p) if s.start < p.last + gapUs =>
                    out(out.length - 1) = OpenSession(p.start,
                      math.max(p.last, s.last), p.n + s.n)
                  case _ => out += s
                }
              }
              out.toList
            }
          // close exactly the sessions the watermark has sealed: no
          // still-admissible event (ts ≥ wm, ms-grained so ≥ wmUs) can
          // fall strictly inside their gap
          val (done, open) = merged.partition(s => s.last + gapUs <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open))
            // next close point in ms, rounded UP so the timeout never
            // fires before the µs seal condition holds; must sit above wm
            state.setTimeoutTimestamp(
              math.max((open.map(_.last + gapUs).min + 999L) / 1000L,
                state.getCurrentWatermarkMs() + 1))
          }
          done.iterator.map(s => ClosedSession(uid, s.start, s.last, s.n))
        })
  }

  /** Stream → table sink via foreachBatch: every micro-batch appends through
    * the SAME alignment/write path as the batch E2 operator — exactly-once
    * per batch id is the caller's contract (idempotent target or dedup key).
    * Mirrors `CsvToPostgresOperator`'s role in a DAG re-run loop. */
  def writeToTable(df: DataFrame, tableName: String,
                   checkpointDir: String,
                   outputMode: OutputMode = OutputMode.Append()) =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").insertInto(tableName)
      }
}
