package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Scrub, TextAnalysis}

/** Structured-Streaming document ingest — the "continuous crawl intake"
  * shape: new corpus files land in a directory, each micro-batch is
  * quality-gated, redacted, and deduplicated BEFORE it reaches the curated
  * store, so the batch curation operators downstream never see raw crawl.
  *
  * Design: the quality gate ([[curatedIngest]]) is STATELESS — every filter
  * and projection is a map-only Column expression from the batch surface
  * ([[Scrub]], [[TextAnalysis]]), so it runs identically under streaming
  * and batch (Structured Streaming's parity promise, pinned in
  * StreamingSpec). Only dedup carries STATE: [[dedupedIngest]] keeps the
  * seen-fingerprint set in the state store (the streaming analog of
  * CCNet's global hash set). State is per-key tiny (an 8-byte hash), but
  * unbounded in key count — for an infinite crawl, either bound it with
  * [[dedupedIngestWithinWatermark]] (duplicates only arrive within a
  * bounded window of each other, the usual crawl-recrawl pattern) or
  * periodically compact the curated store with the batch
  * `Dedup.dedupeAgainst` instead.
  */
object DocumentStreams {

  /** The canonical documents schema (TESTDATA.md) — streaming sources
    * require an explicit schema (no inference pass over an unbounded
    * directory), the same contract as [[graft.sources.JsonL]]. */
  val DocumentsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")

  /** Stream document parquet files from `path` (a directory new files keep
    * landing in), one file per micro-batch by default (the deterministic
    * replay unit). */
  def readDocuments(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 1,
                    schema: org.apache.spark.sql.types.StructType =
                      DocumentsSchema): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(schema)
      .parquet(path)

  /** The stateless quality gate, one codegen'd pass per micro-batch:
    * Gopher document rules + C4 line-level cleaning + PII redaction, with
    * the quality signals kept as inspectable columns (`n_tokens`,
    * `quality`). Identical semantics to the batch x41/x17/x17b surface —
    * same functions, same plan shape. */
  def curatedIngest(docs: DataFrame, minTokens: Int = 30,
                    minStopwordHits: Int = 1): DataFrame = {
    val sig = Scrub.gopherSignals(col("text"))
    docs
      .withColumn("__sig", sig)
      .where(Scrub.gopherKeep(col("__sig"), minTokens = minTokens,
        minStopwordHits = minStopwordHits))
      .withColumn("text", Scrub.redactPii(Scrub.c4CleanText(col("text"))))
      .withColumn("n_tokens", col("__sig.n_tokens"))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .drop("__sig")
  }

  /** Quality gate + STATEFUL exact dedup on the normalized-text
    * fingerprint: the first document with a given fingerprint passes, every
    * later duplicate is dropped — across micro-batches, because the
    * fingerprint set lives in the state store. Append-mode safe (rows are
    * final when emitted). State grows with distinct fingerprints — see the
    * class doc for the two bounding strategies. */
  def dedupedIngest(docs: DataFrame, minTokens: Int = 30,
                    minStopwordHits: Int = 1): DataFrame =
    curatedIngest(docs, minTokens, minStopwordHits)
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fingerprint")

  /** Watermark-bounded streaming dedup: duplicates are only suppressed when
    * they arrive within `delay` (event time on `tsCol`) of the first copy,
    * and state older than the watermark is evicted — bounded state for an
    * unbounded stream. The contract crawl pipelines actually need when
    * recrawls cluster in time. */
  def dedupedIngestWithinWatermark(docs: DataFrame, tsCol: String,
                                   delay: String, minTokens: Int = 30,
                                   minStopwordHits: Int = 1): DataFrame =
    curatedIngest(docs, minTokens, minStopwordHits)
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Continuously-maintained per-language distinct-vocabulary tracker —
    * the streaming face of [[graft.operators.SketchStats]]: each
    * micro-batch's words fold into a PERSISTED per-group HLL artifact at
    * `statePath` via [[graft.operators.SketchStats.mergeHllByGroup]] (one
    * key-bounded shuffle per batch; state size = |languages| sketch rows,
    * never vocabulary). Returns the `StreamingQuery`; read the current
    * estimates any time with `SketchStats.load(spark, statePath)` +
    * `hll_sketch_estimate`. The writes alternate a temp path and a
    * rename-based swap because the new state derives from the old one —
    * overwriting the input of a lazy plan in place would read-after-write
    * the same files. All path operations go through Hadoop's `FileSystem`
    * resolved FROM `statePath` (not `java.nio.file`), so the state may
    * live on HDFS/S3A/local alike; the swap parks the live state at
    * `statePath + "__old"` before renaming the new one into place, and a
    * crash between the two renames is healed at the next batch by
    * restoring `__old` — no window loses the state. Exactly-once folding
    * comes from foreachBatch's
    * batch-id dedup contract ONLY when the sink checkpoint directory is
    * stable across restarts; a replayed batch merges its words twice into
    * the sketch otherwise (HLL double-insert is idempotent per distinct
    * word, so even then only `n_rows` drifts — documents are never
    * double-counted into the DISTINCT estimate, the number that matters). */
  def vocabTracker(docs: DataFrame, langCol: String, textCol: String,
                   statePath: String, checkpoint: String,
                   lgK: Int = 12): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.SketchStats
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val state = new org.apache.hadoop.fs.Path(statePath)
        val fs = state.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parked = new org.apache.hadoop.fs.Path(statePath + "__old")
        // Hadoop FileSystem reports rename/delete failure by RETURNING
        // false (HDFS refuses a rename onto an existing destination), not
        // by throwing — an unchecked false here would let foreachBatch
        // commit the batch id while the swap silently dropped state. Throw
        // instead, so the micro-batch fails and is retried.
        def renameOrFail(src: org.apache.hadoop.fs.Path,
                         dst: org.apache.hadoop.fs.Path): Unit =
          if (!fs.rename(src, dst)) throw new java.io.IOException(
            s"vocabTracker state swap: rename $src -> $dst returned false")
        def deleteOrFail(p: org.apache.hadoop.fs.Path): Unit =
          if (fs.exists(p) && !fs.delete(p, true))
            throw new java.io.IOException(
              s"vocabTracker state swap: delete $p returned false")
        // crash recovery: a previous swap may have parked the live state
        // without finishing the second rename — restore it before reading
        if (!fs.exists(state) && fs.exists(parked)) renameOrFail(parked, state)
        val words = batch.select(col(langCol).as("__lang"),
            explode(split(col(textCol), "\\s+")).as("__w"))
          .where(length(col("__w")) > 0)
        val batchSketch = SketchStats.hllSketchByGroup(
          words, "__lang", col("__w"), lgK)
        val merged =
          if (fs.exists(state))
            SketchStats.mergeHllByGroup(
              SketchStats.load(spark, statePath), batchSketch, "__lang")
          else batchSketch
        val tmp = new org.apache.hadoop.fs.Path(statePath + "__next")
        SketchStats.save(merged, tmp.toString) // overwrite clears stale tmp
        if (fs.exists(state)) {
          deleteOrFail(parked) // stale leftover from a healed crash
          renameOrFail(state, parked)
        }
        renameOrFail(tmp, state)
        deleteOrFail(parked)
        ()
      }
      .start()
  }
}
