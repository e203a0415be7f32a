package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positive-pair construction for contrastive embedding pretraining
  * [Izacard et al. 2022, "Unsupervised Dense Information Retrieval with
  * Contrastive Learning" (Contriever) — independent cropping; Gao et al.
  * 2021, SimCSE, public]: two independently-sampled contiguous token crops
  * of the same document form a positive pair (in-batch negatives come from
  * other documents — see [[SimilaritySearch.hardNegatives]] for the mined
  * kind). This completes the example-construction tier next to
  * [[SpanCorruption]] (T5 masking) and [[Fim]] (decoder-only infilling):
  * same corpus in, training examples out, nothing learned.
  *
  * DETERMINISM — the shared content-keyed recipe ([[Sampling.hashUnit]]
  * sha256-prefix arithmetic): each crop's length fraction and start offset
  * are pure functions of (doc key, salt, crop tag), reproducible across
  * runs, partitionings, and engines; the DuckDB oracle replays the
  * identical arithmetic. Crop k draws its length L_k = max(1,
  * ⌊n · (minFrac + u_k · (maxFrac − minFrac))⌋) from a content-keyed
  * uniform u_k and its start s_k = h_k mod (n − L_k + 1) uniformly over
  * the valid offsets — the paper's independent cropping, made replayable.
  *
  * Shape: entirely per-row Column arithmetic over the token array (slice +
  * array_join) — map-only, scan-fused, codegen'd, no UDF, no shuffle.
  * Empty documents yield empty crops (total output; drop upstream with the
  * shape rules if unwanted). `overlap_tokens` (the size of the crops'
  * token-position intersection) rides along because the overlap statistic
  * is the knob contrastive curricula tune — it is exact integer
  * arithmetic, not an estimate. */
object Contrastive {

  private def h32(id: Column, salt: String, tag: String): Column =
    conv(substring(sha2(concat_ws(":", id.cast("string"), lit(salt),
      lit(tag)), 256), 1, 8), 16, 10).cast("long")

  /** One positive pair per document: `idCol`, `n_tokens`, per-crop
    * (start, len) in token coordinates (0-based start), the two crop
    * strings, and their token-position overlap. */
  def cropPairs(df: DataFrame, idCol: String, textCol: String,
                salt: String = "crop", minFrac: Double = 0.1,
                maxFrac: Double = 0.5): DataFrame = {
    require(minFrac > 0.0 && minFrac <= maxFrac && maxFrac <= 1.0,
      s"need 0 < minFrac <= maxFrac <= 1, got ($minFrac, $maxFrac)")
    val id = col(idCol)
    val toks = filter(split(col(textCol), "\\s+"), w => w =!= "")
    val n = size(toks)
    def crop(tag: String): (Column, Column) = {
      val u = Sampling.hashUnit(concat_ws(":", id.cast("string"), lit(salt),
        lit(s"${tag}l")))
      val len = when(n === 0, lit(0)).otherwise(greatest(lit(1),
        floor(n.cast("double") * (lit(minFrac) +
          u * (maxFrac - minFrac))).cast("int")))
      val start = when(n === 0, lit(0)).otherwise(
        (h32(id, salt, s"${tag}s") % (n.cast("long") - len + 1L)).cast("int"))
      (start, len)
    }
    val (sa, la) = crop("a")
    val (sb, lb) = crop("b")
    val overlap = greatest(lit(0),
      least(sa + la, sb + lb) - greatest(sa, sb))
    df.select(id, col(textCol))
      .select(id,
        n.cast("long").as("n_tokens"),
        sa.cast("long").as("a_start"), la.cast("long").as("a_len"),
        sb.cast("long").as("b_start"), lb.cast("long").as("b_len"),
        array_join(slice(toks, sa + 1, la), " ").as("crop_a"),
        array_join(slice(toks, sb + 1, lb), " ").as("crop_b"),
        overlap.cast("long").as("overlap_tokens"))
  }
}
