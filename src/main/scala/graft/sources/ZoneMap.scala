package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (min/max data skipping — Moerkotte VLDB'98 "small
  * materialized aggregates"; the same idea parquet row groups, ORC stripe
  * stats, and every warehouse's pruning index implement) — the missing
  * layer ABOVE parquet's own footer stats: Spark prunes row groups inside
  * each file it opens, but still has to LIST and OPEN every file; a
  * persisted per-file stats table lets a driver cut the file list itself
  * before the scan starts. On a 100 TB table laid out by [[Bucketing]] or
  * `Layout.zorder` (range-clustered files, tight per-file ranges), a
  * selective range predicate drops all but a handful of files here —
  * footer I/O for millions of files is itself a bottleneck at that scale.
  *
  * No reference analog (`operators.py:80` delegates scanning to Postgres);
  * SURVEY §2c extension, the scan-side complement of x18's Z-order
  * clustering (which exists precisely to make these ranges tight).
  */
object ZoneMap {

  /** ONE scan of the directory → one stats row per file: `(file, rows,
    * <c>_min, <c>_max)` per requested column. Build it once per layout
    * epoch and persist next to the data (it is itself a tiny parquet
    * table); rebuild after compaction — a stale map can only mis-prune,
    * so version it with the layout, not the query.
    *
    * NULL semantics: min/max IGNORE NULLs (Spark aggregate semantics —
    * matching parquet footer stats); a file whose column is entirely NULL
    * gets NULL bounds and is treated as UNPRUNABLE by [[prunedFiles]]
    * (kept — absence of evidence is not exclusion). */
  def build(spark: SparkSession, path: String, cols: Seq[String])
      : DataFrame = {
    require(cols.nonEmpty, "zone map needs at least one column")
    val statCols = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), statCols: _*)
  }

  /** Incremental maintenance for append-only layouts: stats rows for
    * files already in `zoneMap` are reused VERBATIM; only files present
    * in the directory but absent from the map are scanned (the point at
    * 100 TB: a daily crawl append re-scans the day, not the corpus).
    * Returns the merged map, equal to a full [[build]] over the same
    * directory (spec-pinned). If the map references files that no longer
    * exist (compaction, deletes), this REFUSES loudly instead of merging
    * a stale layout — stale rows would mis-prune; rebuild with the
    * layout, that is what "version the map with the layout" means.
    * Listing is a driver-side filesystem call (O(files)), never a scan. */
  def update(spark: SparkSession, path: String, zoneMap: DataFrame,
             cols: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.Path
    def norm(s: String): String = new java.net.URI(s).getPath
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing, because build() reads via spark.read.parquet(path)
    // which descends into partitioned layouts (dt=…/part-*.parquet): a
    // top-level-only listing would see zero files there, making every known
    // file look 'gone' — or worse, on a map built before partitioning,
    // silently returning the stale map unchanged. Hidden entries (_SUCCESS,
    // .crc, _committed) are excluded the same way Spark's file index does:
    // any path COMPONENT under `path` starting with '_' or '.' disqualifies
    // the file.
    val rootDepth = norm(fs.makeQualified(hPath).toString)
      .split('/').count(_.nonEmpty)
    def visible(p: Path): Boolean =
      norm(p.toString).split('/').filter(_.nonEmpty).drop(rootDepth)
        .forall(seg => !seg.startsWith("_") && !seg.startsWith("."))
    val it = fs.listFiles(hPath, true)
    val listedB = Seq.newBuilder[String]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet") && visible(p))
        listedB += p.toString
    }
    val listed = listedB.result()
    require(listed.nonEmpty,
      s"zone map update found no parquet files under $path — either the " +
        "directory vanished or the layout moved; rebuild the map with the " +
        "layout instead of merging against an empty listing")
    val listedNorm = listed.map(norm).toSet
    val known = zoneMap.select("file").collect().map(_.getString(0)).toSeq
    val gone = known.filterNot(f => listedNorm.contains(norm(f)))
    require(gone.isEmpty,
      s"zone map references ${gone.size} file(s) no longer in $path " +
        s"(first: ${gone.headOption.getOrElse("")}) — the layout was " +
        "compacted or pruned; rebuild the map with the layout instead of " +
        "merging stale bounds")
    val knownNorm = known.map(norm).toSet
    val fresh = listed.filterNot(f => knownNorm.contains(norm(f)))
    if (fresh.isEmpty) zoneMap
    else {
      val statCols = cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
      }
      val freshStats = spark.read.parquet(fresh: _*)
        .groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("rows"), statCols: _*)
      zoneMap.unionByName(freshStats)
    }
  }

  /** The file list a range predicate `valueCol BETWEEN lo AND hi` cannot
    * exclude: a file survives unless `max < lo` or `min > hi` is PROVEN
    * (NULL bounds keep the file). Driver-side O(files) rows — the zone map
    * is per-file, bounded by the layout, never by the corpus. Returned
    * sorted for deterministic downstream listing. */
  def prunedFiles(zoneMap: DataFrame, valueCol: String,
                  lo: Any, hi: Any): Seq[String] = {
    val excluded = col(s"${valueCol}_max") < lit(lo) ||
      col(s"${valueCol}_min") > lit(hi)
    zoneMap.where(!coalesce(excluded, lit(false)))
      .select("file").collect().map(_.getString(0)).toSeq.sorted
  }

  /** Range scan through the zone map: read ONLY the surviving files, then
    * apply the exact predicate (zone pruning is necessarily conservative —
    * a surviving file still carries out-of-range rows). Returns the
    * filtered frame plus `(filesTotal, filesRead)` so callers can assert
    * pruning actually engaged (a zone map over one giant file prunes
    * nothing — that is a LAYOUT bug, and silently scanning everything
    * would hide it). An all-files-pruned predicate short-circuits to an
    * empty frame without touching the data (schema from a footer-only
    * read). */
  def prunedScan(spark: SparkSession, path: String, zoneMap: DataFrame,
                 valueCol: String, lo: Any, hi: Any)
      : (DataFrame, Long, Long) = {
    val total = zoneMap.count()
    val files = prunedFiles(zoneMap, valueCol, lo, hi)
    val pred = (c: DataFrame) =>
      c.where(col(valueCol).between(lit(lo), lit(hi)))
    val df =
      if (files.isEmpty) pred(spark.read.parquet(path)).where(lit(false))
      else pred(spark.read.parquet(files: _*))
    (df, total, files.size.toLong)
  }
}
