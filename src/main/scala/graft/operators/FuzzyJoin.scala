package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join — the record-linkage /
  * entity-resolution primitive: all pairs of short strings within edit
  * distance `maxDist`, WITHOUT the |L|×|R| cross join. The reference engine
  * (operators.py:80) delegates everything to Postgres and has no fuzzy-match
  * surface; this is SURVEY.md §2c extension territory (near-dup family,
  * character-level instead of shingle-level).
  *
  * Candidate scheme — segment pigeonhole (the PassJoin family, Li/Deng/Feng,
  * ICDE 2011, public literature): partition the probe string s into
  * `maxDist + 1` contiguous segments; at most `maxDist` edits cannot touch
  * every segment, so if edit(s, t) ≤ maxDist at least one segment survives
  * VERBATIM as a substring of t, displaced by at most `maxDist` positions
  * (each edit shifts later characters by ≤ 1). So:
  *
  *   - probe side: each distinct string of length n ≥ maxDist+1 emits its
  *     maxDist+1 segments keyed by (n, segment index, segment text);
  *   - index side: each distinct string t emits, for every candidate probe
  *     length n within ±maxDist of |t| and every segment index j, the
  *     substrings of t with segment-j's length starting within ±maxDist of
  *     segment-j's position — O((2·maxDist+1)²·(maxDist+1)) short keys per
  *     string, constant in corpus size;
  *   - equi-join on the key → candidate string pairs → `distinct` →
  *     verify with the codegen'd `levenshtein(_, _, threshold)` (early-exit
  *     banded DP) → expand back to id pairs by joining each side's id table
  *     on string equality.
  *
  * Probe strings SHORTER than maxDist+1 chars can have every segment edited,
  * so the lemma gives no signal; they take a separate short-bucket path — a
  * (tiny × tiny) join of strings ≤ maxDist chars against strings ≤ 2·maxDist
  * chars, broadcast by construction.
  *
  * Scale properties: candidates are generated on DISTINCT strings (dedup
  * first — hot strings, e.g. repeated product names, verify once and fan out
  * only in the final id-expansion join); join keys are short substrings, so
  * the exchange is narrow; the verify stage is output-bound (|candidate
  * pairs|, not |L|×|R|), with the levenshtein threshold variant giving
  * O(maxDist·len) per pair instead of O(len²). A pathological corpus (one
  * segment shared by everything, e.g. a constant prefix) degrades the
  * candidate join the way any equi-join degrades on a hot key — AQE skew
  * handling applies, and key salting composes if needed.
  *
  * Intended for SHORT strings (names, titles, codes — tens to hundreds of
  * chars). For document-scale text use the shingle/MinHash family
  * ([[NearDup]]); character-level edit distance is the wrong metric there
  * anyway. NULL strings never match (dropped from both sides). Matching is
  * case- and whitespace-exact; normalize upstream if needed.
  */
object FuzzyJoin {

  /** All (left_id, right_id, dist) with levenshtein(left str, right str) ≤
    * `maxDist` — including equal strings at dist 0. Output ordered by
    * nothing (add orderBy downstream for determinism of row order). */
  def editDistancePairs(left: DataFrame, leftId: String, leftStr: String,
                        right: DataFrame, rightId: String, rightStr: String,
                        maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val l = left.select(col(leftId).as("left_id"), col(leftStr).as("__ls"))
      .where(col("__ls").isNotNull)
    val r = right.select(col(rightId).as("right_id"), col(rightStr).as("__rs"))
      .where(col("__rs").isNotNull)
    if (maxDist == 0) {
      // degenerate: exact string equality — one hash join, no machinery
      return l.join(r, col("__ls") === col("__rs"))
        .select(col("left_id"), col("right_id"), lit(0).as("dist"))
    }
    val ldist = l.select(col("__ls").as("__s")).distinct()
    val rdist = r.select(col("__rs").as("__t")).distinct()
    val strPairs = verifiedStringPairs(ldist, rdist, maxDist)
    // expand verified string pairs back to id pairs: two equi-joins — the
    // only stage where a hot (duplicated) string fans out, and it fans out
    // AFTER verification, so each distinct pair pays levenshtein once
    strPairs
      .join(l, col("__s") === col("__ls"))
      .join(r, col("__t") === col("__rs"))
      .select(col("left_id"), col("right_id"), col("dist"))
  }

  /** Self-join form: unordered pairs (id_a < id_b, dist) within `maxDist`,
    * equal strings included at dist 0. `idCol` must be numeric/orderable
    * and unique.
    *
    * Scale caveat: the OUTPUT is quadratic in per-string duplicate count
    * (every id pair materializes) — with heavy duplication, prefer
    * [[editDistanceGroupedSelfPairs]], whose output stays at the distinct-
    * string level and carries the id-pair multiplicity as a count. */
  def editDistanceSelfPairs(df: DataFrame, idCol: String, strCol: String,
                            maxDist: Int): DataFrame =
    editDistancePairs(df, idCol, strCol, df, idCol, strCol, maxDist)
      .where(col("left_id") < col("right_id"))
      .select(col("left_id").as("id_a"), col("right_id").as("id_b"), col("dist"))

  /** The self-join at DISTINCT-STRING granularity — the 100 TB shape when
    * strings repeat (canonicalization / entity resolution outputs a
    * cluster-level mapping, never all id pairs): unordered distinct string
    * pairs (str_a < str_b) within `maxDist`, each with its edit distance
    * and `n_id_pairs` = (#rows with str_a) × (#rows with str_b) — the
    * exact cardinality [[editDistanceSelfPairs]] would materialize for the
    * pair, so the expansion is accounted for without being materialized.
    * Equal-string (dist 0) groups are excluded here — that's exact-dup
    * territory ([[Dedup]]); this surface is the near-miss map. */
  def editDistanceGroupedSelfPairs(df: DataFrame, strCol: String,
                                   maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1 for near-miss pairs, got $maxDist")
    val counts = df.select(col(strCol).as("__str"))
      .where(col("__str").isNotNull)
      .groupBy("__str").agg(count(lit(1)).as("__cnt"))
    val strs = counts.select(col("__str"))
    // Canonicalize with least/greatest rather than filtering __s < __t: a
    // pair whose lengths straddle the short-bucket boundary is discovered
    // in ONE probe→index orientation only, and that orientation may be the
    // lexicographically descending one. Levenshtein is symmetric, so the
    // distinct collapses double-found pairs exactly.
    val pairs = verifiedStringPairs(
        strs.select(col("__str").as("__s")),
        strs.select(col("__str").as("__t")), maxDist)
      .where(col("__s") =!= col("__t")) // near-miss map: drop dist-0 (s==s)
      .select(least(col("__s"), col("__t")).as("__a"),
        greatest(col("__s"), col("__t")).as("__b"), col("dist"))
      .distinct()
    pairs
      .join(counts.select(col("__str").as("__a"), col("__cnt").as("__ca")), "__a")
      .join(counts.select(col("__str").as("__b"), col("__cnt").as("__cb")), "__b")
      .select(col("__a").as("str_a"), col("__b").as("str_b"), col("dist"),
        (col("__ca") * col("__cb")).as("n_id_pairs"))
  }

  /** Distinct verified string pairs (__s, __t, dist ≤ maxDist ≥ 1).
    * Candidates from the segment scheme plus the short-string bucket. */
  private def verifiedStringPairs(ldist: DataFrame, rdist: DataFrame,
                                  maxDist: Int): DataFrame = {
    val d = maxDist
    val probeKeys = segmentKeys(ldist, d)
    val indexKeys = substringKeys(rdist, d)
    val mainCand = probeKeys.join(indexKeys, Seq("__n", "__j", "__key"))
      .select("__s", "__t")
    // short bucket: probes with < d+1 chars — every segment can be edited,
    // so pair them against ALL plausible partners (length ≤ 2d) directly.
    // Both sides are length-bounded by a constant, so this join is tiny and
    // broadcastable no matter the corpus size.
    val shortCand = ldist.where(length(col("__s")) <= d)
      .crossJoin(broadcast(rdist.where(length(col("__t")) <= 2 * d)))
      .where(abs(length(col("__s")) - length(col("__t"))) <= d)
      .select("__s", "__t")
    mainCand.union(shortCand).distinct()
      .withColumn("dist", levenshtein(col("__s"), col("__t"), d))
      .where(col("dist") >= 0) // threshold form returns -1 above the bound
  }

  /** Even partition of a length-n string into d+1 segments: segment j has
    * length base+1 for the last (n mod (d+1)) segments, base otherwise —
    * the SAME arithmetic on both sides, expressed as Columns. Returns
    * (start0, len) as 0-based Columns given (__n, __j). */
  private def segGeometry(n: Column, j: Column, d: Int): (Column, Column) = {
    val parts = lit(d + 1)
    val base = floor(n / parts).cast("int")
    val rem = (n % parts).cast("int")
    val firstLong = parts - rem // segments [firstLong, d] have length base+1
    val len = base + when(j >= firstLong, 1).otherwise(0)
    val start = j * base + greatest(lit(0), j - firstLong)
    (start, len)
  }

  /** Probe-side keys: (n, j, segment text) for strings with ≥ d+1 chars. */
  private def segmentKeys(strs: DataFrame, d: Int): DataFrame = {
    val withJ = strs
      .select(col("__s"), length(col("__s")).as("__n"))
      .where(col("__n") >= d + 1)
      .select(col("__s"), col("__n"),
        explode(sequence(lit(0), lit(d))).as("__j"))
    val (start, len) = segGeometry(col("__n"), col("__j"), d)
    withJ.select(col("__s"), col("__n"), col("__j"),
      col("__s").substr(start + 1, len).as("__key"))
  }

  /** Index-side keys: for every candidate probe length n in [m−d, m+d] with
    * n ≥ d+1 and every segment index j, the substrings of __t with the
    * (n, j) segment length starting within ±d of the segment position
    * (clamped to valid starts). `when(lo ≤ hi, sequence)` guards against
    * Spark's descending-sequence semantics; explode(null) emits nothing. */
  private def substringKeys(strs: DataFrame, d: Int): DataFrame = {
    def boundedSeq(lo: Column, hi: Column): Column =
      when(lo <= hi, sequence(lo, hi))
    val withN = strs
      .select(col("__t"), length(col("__t")).as("__m"))
      .select(col("__t"), col("__m"),
        explode(boundedSeq(greatest(lit(d + 1), col("__m") - d),
          col("__m") + d)).as("__n"))
    val withJ = withN.select(col("__t"), col("__m"), col("__n"),
      explode(sequence(lit(0), lit(d))).as("__j"))
    val (start, len) = segGeometry(col("__n"), col("__j"), d)
    withJ
      .select(col("__t"), col("__n"), col("__j"), len.as("__len"),
        explode(boundedSeq(greatest(lit(0), start - d),
          least(col("__m") - len, start + d))).as("__st"))
      .select(col("__t"), col("__n"), col("__j"),
        col("__t").substr(col("__st") + 1, col("__len")).as("__key"))
  }
}
