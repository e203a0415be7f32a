package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit conformance (Newcomb 1881; Benford 1938; Nigrini
  * 2012 forensic-accounting practice) — the data-forensics screen over
  * numeric metadata: naturally-generated multi-scale quantities (prices,
  * populations, file sizes) follow P(d) = log10(1 + 1/d) in their first
  * significant digit, while fabricated, synthetic, truncated, or
  * unit-capped columns do not. In a corpus pipeline this is the cheap
  * "does this source's numeric metadata look organic?" read — a
  * first-digit histogram plus Nigrini's MAD, one scan. Values must span
  * scales for the law to apply (a narrow-range column SHOULD fail — that
  * is a finding about the column, not the test). No reference analog
  * (`operators.py:80`); SURVEY §2c extension.
  */
object Forensics {

  /** Per-digit frame `(digit, n_obs, prop, expected, dev)` for digits 1-9
    * plus the constant Nigrini `mad` column (mean |prop − expected| over
    * the 9 digits; conformity bands: < 0.006 close, < 0.012 acceptable,
    * < 0.015 marginal). Digits absent from the data still appear (their
    * full expectation is deviation — the x132 zero-cell lesson); the
    * digit spine is 9 literal rows, no corpus spine. The input must be a
    * POSITIVE INTEGRAL column: the first digit comes from the decimal
    * rendering of a BIGINT — exact and identical cross-engine, where a
    * double rendering or a log10-based extraction can flip at powers of
    * ten by one ulp. Non-positive or NULL values fail loudly (Benford is
    * undefined there — filter upstream, and the filter choice is a
    * forensic decision worth making explicit).
    *
    * Shape: one map-only digit extraction + a 9-group count shuffle; the
    * spine join and MAD fold run on the 9-row artifact. Counts exact;
    * log10 is the one libm op (consumers hash-pinning canonicalize —
    * the gate pins round6). */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = when(col(valueCol).isNull || col(valueCol).cast("long") <= 0,
        raise_error(lit(s"benfordDigits: $valueCol must be a positive " +
          "integral value — filter or transform upstream, and make that " +
          "choice explicit")))
      .otherwise(col(valueCol).cast("long"))
    val counts = df
      .select(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val n = counts.agg(sum("n_obs").as("__n"))
    val spine = (1 to 9).toDF("digit")
    val perDigit = spine
      .join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(n))
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast("double") / col("__n").cast("double"))
          .as("prop"),
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          .as("expected"))
      .withColumn("dev", abs(col("prop") - col("expected")))
    val mad = perDigit.agg((sum("dev") / 9.0).as("mad"))
    perDigit.crossJoin(broadcast(mad))
      .select("digit", "n_obs", "prop", "expected", "dev", "mad")
  }
}
