package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Near-duplicate detection (SURVEY.md §2c X2): MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the whole point of these over pairwise comparison):
  *  - signatures are per-row Column expressions — a map-only pass, codegen'd,
  *    no UDFs, no shuffle;
  *  - candidate generation is an equi-join on (band, bandHash) — ONE shuffle
  *    keyed by 12 bytes, never on document text; at 100 TB with 1000
  *    executors this is the standard banded-LSH shuffle and AQE handles the
  *    (hot-band) skew;
  *  - only candidate pairs (a tiny fraction) are exactly re-verified.
  */
object NearDup {

  /** k-shingles over whitespace tokens, as a per-row expression. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** 64-bit hashes of the k-shingles — computed ONCE per row. Downstream
    * min-hash families rehash these LONGS, never the strings: an outer-lambda
    * body is re-evaluated per element, so tokenizing inside the signature
    * loop would cost numHashes× the string work. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    transform(shingles(text, k), s => xxhash64(s))

  /** MinHash signature over precomputed shingle hashes:
    * sig[i] = min over shingles of xxhash64(shingleHash, i). Array[Long]. */
  def minhashFromHashes(hs: Column, numHashes: Int = 128): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(hs, h => xxhash64(h, seed))))

  /** MinHash signature of a text column (convenience; see the two-stage
    * [[minhashCandidates]] for the scale path). */
  def minhashSignature(text: Column, numHashes: Int = 128, k: Int = 3): Column =
    minhashFromHashes(shingleHashes(text, k), numHashes)

  /** Banded-LSH candidate pairs with MinHash-estimated Jaccard.
    *
    * `bands` × `rowsPerBand` must equal the signature length. Two documents
    * collide if any band of their signatures matches exactly; collision
    * probability ≈ 1-(1-j^r)^b (the standard S-curve). Output:
    * (id_1, id_2, est_jaccard) with id_1 < id_2, deduplicated across bands.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, bands: Int = 32, k: Int = 3,
                        minEstJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    graft.plans.HashExpressions.register(df.sparkSession)
    // Signatures: strings are tokenized/shingled/hashed once per row (single
    // consumer — safe to leave lazy), then the native minhash expression runs
    // one primitive loop per row. The signature frame IS persisted: Catalyst
    // collapses projections without cross-expression CSE, so an
    // unmaterialized signature would be recomputed per band expression and
    // per join side. At cluster scale this is |corpus| × numHashes × 8B,
    // spillable — the standard production-LSH shape.
    val sig = df.select(col(idCol).as("__id"),
      call_function("graft_minhash_sig",
        call_function("graft_shingle_hashes", col(textCol), lit(k)),
        lit(numHashes)).as("__sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The candidate join shuffles only (band, bandHash, id) — 20 bytes/row,
    // never the 1KB signature (and never the text). Signatures re-attach to
    // the few surviving candidate pairs afterwards.
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("__sig"), b * r + 1, lit(r))), b)))
        .as(Seq("__band", "__bh")))
    val a = banded.select(col("__band"), col("__bh"), col("__id").as("id_1"))
    val b = banded.select(col("__band"), col("__bh"), col("__id").as("id_2"))
    val cand = a.join(b, Seq("__band", "__bh")).where(col("id_1") < col("id_2"))
      .select("id_1", "id_2").dropDuplicates("id_1", "id_2")
    val out = cand
      .join(sig.select(col("__id").as("id_1"), col("__sig").as("__sig1")), "id_1")
      .join(sig.select(col("__id").as("id_2"), col("__sig").as("__sig2")), "id_2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("__sig1"), col("__sig2"),
          (x, y) => x === y), eq => eq)).cast("double") / numHashes)
      .where(col("est_jaccard") >= minEstJaccard)
      .select("id_1", "id_2", "est_jaccard")
    materializeAndRelease(out, sig)
  }

  /** Candidate-pair outputs are a tiny fraction of the corpus, so they are
    * materialized eagerly (localCheckpoint) and the big signature cache is
    * released immediately — repeated calls in a long-lived session no longer
    * accumulate MEMORY_AND_DISK signature blocks the caller can't free. The
    * returned (small) frame is itself cached; callers may `.unpersist()` it. */
  private def materializeAndRelease(out: DataFrame, sig: DataFrame): DataFrame =
    try out.localCheckpoint(true) finally sig.unpersist(false)

  /** Exact n-gram Jaccard for a pair of text columns (used to re-verify LSH
    * candidates, or directly at small scale). */
  def jaccard(a: Column, b: Column, k: Int = 3): Column = {
    val sa = array_distinct(shingles(a, k)); val sb = array_distinct(shingles(b, k))
    size(array_intersect(sa, sb)).cast("double") /
      nullif(size(array_union(sa, sb)), lit(0)).cast("double")
  }

  /** Full near-dup pipeline: LSH candidates re-verified with exact Jaccard.
    * Joining text back costs one broadcast-or-shuffle of (id → text) for the
    * candidate ids only — not all pairs. */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     minJaccard: Double = 0.8, numHashes: Int = 128,
                     bands: Int = 32, k: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, k,
      minEstJaccard = minJaccard * 0.7) // loose pre-filter; exact check below
    val txt = df.select(col(idCol), col(textCol))
    cands
      .join(txt.select(col(idCol).as("id_1"), col(textCol).as("__t1")), "id_1")
      .join(txt.select(col(idCol).as("id_2"), col(textCol).as("__t2")), "id_2")
      .withColumn("jaccard", jaccard(col("__t1"), col("__t2"), k))
      .where(col("jaccard") >= minJaccard)
      .select("id_1", "id_2", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens — per-row expression, no shuffle.
    * Bit i of the result = sign of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). */
  def simhash(text: Column): Column = {
    // One pass over the tokens: the accumulator is 64 bit-counters; token
    // bits come from the 64-char padded binary string of its hash (char 1 is
    // bit 63, char 65-p is bit p-1), since shift amounts can't be lambda vars.
    // The bit strings are built in their own transform so each token is
    // hashed+formatted once, not once per bit position.
    val hbs = transform(TextAnalysis.tokens(text),
      t => lpad(bin(xxhash64(t)), 64, "0"))
    val counters = aggregate(
      hbs,
      array_repeat(lit(0), 64),
      (acc, hb) =>
        zip_with(acc, sequence(lit(1), lit(64)),
          (c, pos) => c + when(hb.substr(lit(65) - pos, lit(1)) === "1", 1).otherwise(-1)))
    (0 until 64).map(i =>
      when(element_at(counters, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes (bit_count of XOR). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: documents whose simhashes differ in ≤ maxBits.
    *
    * Candidate generation by band equality with the band count DERIVED from
    * the threshold: splitting 64 bits into `maxBits + 1` bands guarantees by
    * pigeonhole that any pair within Hamming distance `maxBits` shares at
    * least one exact band — full recall at every threshold (maxBits=3 → the
    * classic 4×16-bit scheme). Map-only signatures + one narrow equi-join
    * shuffle; more bands (higher maxBits) → more candidates, as it must. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxBits: Int = 3): DataFrame = {
    require(maxBits >= 0 && maxBits <= 63, s"maxBits must be in [0,63], got $maxBits")
    val nBands = maxBits + 1
    // Band b covers width 64/nBands (+1 for the first 64%nBands bands).
    val widths = Array.tabulate(nBands)(b => 64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val starts = widths.scanLeft(0)(_ + _)
    def bandOf(sh: Column, b: Int): Column =
      if (widths(b) >= 64) sh
      else shiftright(sh, starts(b)).bitwiseAND((1L << widths(b)) - 1L)
    // materialized for the same projection-collapse reason as minhash above;
    // native expression (one call/row) instead of the interpreted HOF fold
    graft.plans.HashExpressions.register(df.sparkSession)
    val sig = df.select(col(idCol).as("__id"),
      call_function("graft_simhash", TextAnalysis.tokens(col(textCol))).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sig.select(col("__id"), col("__sh"),
      posexplode(array((0 until nBands).map(b => bandOf(col("__sh"), b)): _*))
        .as(Seq("__band", "__bh")))
    val a = banded.select(col("__band"), col("__bh"), col("__id").as("id_1"), col("__sh").as("__sh1"))
    val b = banded.select(col("__band"), col("__bh"), col("__id").as("id_2"), col("__sh").as("__sh2"))
    val out = a.join(b, Seq("__band", "__bh")).where(col("id_1") < col("id_2"))
      .dropDuplicates("id_1", "id_2")
      .withColumn("hamming", hammingDistance(col("__sh1"), col("__sh2")))
      .where(col("hamming") <= maxBits)
      .select("id_1", "id_2", "hamming")
    materializeAndRelease(out, sig)
  }

  /** Embedding-cosine near-dup pairs via the similarity-search LSH machinery. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        minCosine: Double = 0.95, planes: Int = 16,
                        seed: Long = 42L): DataFrame =
    SimilaritySearch.lshSelfPairs(df, idCol, vecCol, planes, seed)
      .where(col("cosine") >= minCosine)
}
