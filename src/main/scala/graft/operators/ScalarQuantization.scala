package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-dimension affine int8 quantization of embedding columns — the
  * storage-tier companion to [[ProductQuantization]]: PQ crushes vectors
  * ~32× for ANN candidate scoring; scalar int8 is the lighter 4× that
  * keeps per-dimension semantics (dequantization is exact-shape, error is
  * bounded per dimension by scale/2), the standard format for shipping
  * embedding shards at corpus scale. No reference analog (operators.py
  * delegates everything to Postgres) — SURVEY §2c similarity-search
  * territory.
  *
  * Fit is ONE aggregation: posexplode to (dim, value) pairs and take
  * per-dim min/max — the shuffle is partial-aggregate-bounded at
  * `dim × partitions` narrow rows regardless of corpus size, and the
  * artifact is `2 × dim` doubles (a model, like IVF centroids; same
  * save/load parquet contract). Quantize/dequantize are map-only
  * `transform(...)` expressions over foldable parameter literals —
  * codegen'd, fused with the scan, no UDF.
  *
  * Portability contract: code_j = floor((x_j − min_j) · 255 / (max_j −
  * min_j) + 0.5) − 128, clamped to [−128, 127] — half-UP rounding via the
  * floor(+0.5) spelling, which evaluates identically in Spark and DuckDB
  * (engine `round()` differs at ties), so the codes are engine-portable
  * and the gate entry can hash-pin them exactly. A zero-range dimension
  * (max = min) quantizes to code −128 (= raw 0) and dequantizes back to
  * its constant. NULL vectors pass through as NULL. */
object ScalarQuantization {

  final case class ScalarQuantParams(mins: Array[Double], maxs: Array[Double]) {
    require(mins.length == maxs.length && mins.nonEmpty,
      "mins/maxs must align and be non-empty")
    def dim: Int = mins.length
  }

  /** Per-dimension [min, max] over the corpus — one partial-agg-bounded
    * pass; NULL vectors skipped. Fails loud on ragged dimensions. */
  def fit(df: DataFrame, vecCol: String): ScalarQuantParams = {
    val dims = df.select(posexplode(col(vecCol)).as(Seq("__dim", "__x")))
      .groupBy("__dim")
      .agg(min(col("__x").cast("double")).as("__mn"),
        max(col("__x").cast("double")).as("__mx"),
        count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    require(dims.nonEmpty, s"fit: no non-null vectors in '$vecCol'")
    // every dimension must appear in exactly as many rows as dimension 0 —
    // catches ragged inputs whether they leave index gaps or not
    require(dims.map(_._1).toSeq == (0 until dims.length) &&
        dims.forall(_._4 == dims.head._4),
      "fit: ragged vector dimensions — every row must have the same length")
    ScalarQuantParams(dims.map(_._2), dims.map(_._3))
  }

  private def litArray(xs: Array[Double]): Column = array(xs.map(lit): _*)

  /** Map-only int8 encode: `outCol` is array<tinyint> codes in [−128, 127]
    * (see the portability contract above). Vectors must have `params.dim`
    * elements — shorter/longer rows fail at runtime via element_at. */
  def quantize(df: DataFrame, vecCol: String, params: ScalarQuantParams,
               outCol: String = "codes"): DataFrame = {
    val mins = litArray(params.mins)
    val scales = litArray(params.mins.indices.map { j =>
      val r = params.maxs(j) - params.mins(j)
      if (r == 0.0) 0.0 else 255.0 / r
    }.toArray)
    df.withColumn(outCol,
      transform(col(vecCol), (x, j) =>
        least(lit(127), greatest(lit(-128),
          (floor((x.cast("double") - element_at(mins, j + 1))
            * element_at(scales, j + 1) + lit(0.5)) - lit(128)).cast("int")))
          .cast("byte")))
  }

  /** Map-only decode back to array<float> — plugs straight into
    * [[SimilaritySearch.topK]] and friends. Reconstruction error per
    * dimension is ≤ (max−min)/510 + float cast rounding. */
  def dequantize(df: DataFrame, codesCol: String, params: ScalarQuantParams,
                 outCol: String = "dequantized"): DataFrame = {
    val mins = litArray(params.mins)
    val steps = litArray(params.mins.indices.map { j =>
      (params.maxs(j) - params.mins(j)) / 255.0
    }.toArray)
    df.withColumn(outCol,
      transform(col(codesCol), (c, j) =>
        ((c.cast("double") + lit(128)) * element_at(steps, j + 1)
          + element_at(mins, j + 1)).cast("float")))
  }

  /** Brute-force cosine top-k over a QUANTIZED corpus: dequantize on the
    * fly (map-only, fused with the scan of the 4×-smaller codes) and rank
    * against the float query. Same contract as [[SimilaritySearch.topK]];
    * recall vs the float corpus is pinned in ScalarQuantizationSpec. */
  def quantizedTopK(codes: DataFrame, idCol: String, codesCol: String,
                    params: ScalarQuantParams, query: Array[Float],
                    k: Int): DataFrame = {
    val deq = dequantize(codes, codesCol, params, "__deq")
      .select(col(idCol), col("__deq"))
    SimilaritySearch.topK(deq, idCol, "__deq", query, k)
  }

  /** Persist / load the per-dim parameters — the artifact contract shared
    * with [[SimilaritySearch.saveCentroids]]. */
  def save(spark: SparkSession, params: ScalarQuantParams, path: String): Unit = {
    import spark.implicits._
    params.mins.indices.map(j => (j, params.mins(j), params.maxs(j)))
      .toDF("dim", "min", "max").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): ScalarQuantParams = {
    val rows = spark.read.parquet(path).select("dim", "min", "max")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    ScalarQuantParams(rows.map(_._2), rows.map(_._3))
  }
}
