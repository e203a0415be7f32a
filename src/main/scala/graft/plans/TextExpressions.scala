package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.lang.Character.UnicodeScript

/** Native single-pass text analysis (scale companions to
  * [[graft.functions.TextAnalysis]]'s Column formulations — same semantics,
  * one primitive scan per row instead of several interpreted HOF passes;
  * equivalence is pinned by `NativeTextSpec`). At billions of documents the
  * Column versions' ~0.4 ms/doc of interpreted lambda evals is hours of
  * cluster time; these run in ~10 µs/doc. */
object TextKernels {

  /** whitespace per java regex \s — what the Column version splits on */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline def isAlnum(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  val EnglishStopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
      "on", "with", "as", "was", "at", "by", "an", "be", "this", "are")
      .foreach(s.add)
    s
  }

  final case class Stats(nTokens: Int, nBpeish: Int, punctRatio: Double,
                         meanTokLen: Double, stopwordRatio: Double)

  def stats(s: String): Stats = {
    var i = 0
    val n = s.length
    var nTokens = 0
    var tokLenSum = 0L   // code points across tokens
    var stopHits = 0
    var alnumRuns = 0
    var punct = 0        // non-alnum, non-whitespace code points
    var totalCp = 0
    var inAlnumRun = false
    val tok = new java.lang.StringBuilder(32)
    def endToken(): Unit = if (tok.length() > 0) {
      nTokens += 1
      tokLenSum += tok.codePoints().count()
      if (EnglishStopwords.contains(tok.toString.toLowerCase)) stopHits += 1
      tok.setLength(0)
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      totalCp += 1
      val ws = cp < 0x10000 && isWs(cp.toChar)
      if (ws) { endToken(); inAlnumRun = false }
      else {
        tok.appendCodePoint(cp)
        if (isAlnum(cp)) {
          if (!inAlnumRun) { alnumRuns += 1; inAlnumRun = true }
        } else { punct += 1; inAlnumRun = false }
      }
      i += cc
    }
    endToken()
    Stats(
      nTokens,
      alnumRuns + punct,
      if (totalCp == 0) Double.NaN else punct.toDouble / totalCp,
      if (nTokens == 0) Double.NaN else tokLenSum.toDouble / nTokens,
      if (nTokens == 0) Double.NaN else stopHits.toDouble / nTokens)
  }

  private val EsSw = mkSet("el", "la", "de", "que", "y", "en", "los", "del", "se", "las", "por", "un", "una", "con", "para")
  private val DeSw = mkSet("der", "die", "das", "und", "ist", "von", "den", "im", "mit", "für", "auf", "ein", "eine", "nicht")
  private val FrSw = mkSet("le", "la", "les", "de", "des", "et", "est", "un", "une", "du", "dans", "que", "pour", "sur")
  private def mkSet(w: String*) = { val s = new java.util.HashSet[String](); w.foreach(s.add); s }

  /** Mirrors [[graft.functions.TextAnalysis.langId]]'s decision chain. */
  def langId(s: String): String = {
    var i = 0; val n = s.length
    var total = 0
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var ara = 0; var dev = 0
    var en = 0; var es = 0; var de = 0; var fr = 0
    val tok = new java.lang.StringBuilder(32)
    def endToken(): Unit = if (tok.length() > 0) {
      val w = tok.toString.toLowerCase
      if (EnglishStopwords.contains(w)) en += 1
      if (EsSw.contains(w)) es += 1
      if (DeSw.contains(w)) de += 1
      if (FrSw.contains(w)) fr += 1
      tok.setLength(0)
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      total += 1
      val script = UnicodeScript.of(cp)
      script match {
        case UnicodeScript.HAN => han += 1
        case UnicodeScript.HIRAGANA | UnicodeScript.KATAKANA => kana += 1
        case UnicodeScript.HANGUL => hangul += 1
        case UnicodeScript.CYRILLIC => cyr += 1
        case UnicodeScript.ARABIC => ara += 1
        case UnicodeScript.DEVANAGARI => dev += 1
        case _ =>
      }
      val ws = cp < 0x10000 && isWs(cp.toChar)
      if (ws) endToken() else tok.appendCodePoint(cp)
      i += cc
    }
    endToken()
    if (total == 0) return "und"
    val t = total.toDouble
    if (han / t > 0.05) "zh"
    else if (kana / t > 0.05) "ja"
    else if (hangul / t > 0.05) "ko"
    else if (cyr / t > 0.2) "ru"
    else if (ara / t > 0.2) "ar"
    else if (dev / t > 0.2) "hi"
    else if (es > en && es >= de && es >= fr) "es"
    else if (de > en && de >= es && de >= fr) "de"
    else if (fr > en && fr >= es && fr >= de) "fr"
    else if (en > 0) "en"
    else "und"
  }
}

/** `graft_text_stats(text)` → struct<n_tokens INT, n_bpeish INT,
  * punct_ratio DOUBLE, mean_tok_len DOUBLE, stopword_ratio DOUBLE>. */
case class TextStatsExpr(text: Expression)
  extends UnaryExpression with CodegenFallback {

  override def child: Expression = text
  override def prettyName: String = "graft_text_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("punct_ratio", DoubleType),
    StructField("mean_tok_len", DoubleType),
    StructField("stopword_ratio", DoubleType)))

  override def nullSafeEval(v: Any): Any = {
    val st = TextKernels.stats(v.toString)
    InternalRow(st.nTokens, st.nBpeish,
      if (st.punctRatio.isNaN) null else st.punctRatio,
      if (st.meanTokLen.isNaN) null else st.meanTokLen,
      if (st.stopwordRatio.isNaN) null else st.stopwordRatio)
  }

  override protected def withNewChildInternal(c: Expression): TextStatsExpr =
    copy(text = c)
}

/** `graft_lang_id(text)` → STRING language code (or 'und'). */
case class LangIdExpr(text: Expression)
  extends UnaryExpression with CodegenFallback {

  override def child: Expression = text
  override def prettyName: String = "graft_lang_id"
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextKernels.langId(v.toString))

  override protected def withNewChildInternal(c: Expression): LangIdExpr =
    copy(text = c)
}

/** `graft_winnow(text, k, w)` → `ARRAY<BIGINT>`: winnowing fingerprints
  * (Schleimer, Wilkerson, Aiken — SIGMOD'03, the MOSS algorithm).
  *
  * A Rabin–Karp ROLLING hash (base-B polynomial over characters, wrapping
  * 64-bit arithmetic — O(1) per position) hashes every k-char gram of the
  * whitespace-normalized, lowercased text; each window of `w` consecutive
  * gram hashes selects its minimum (rightmost on ties, per the paper), and
  * the distinct selected hashes in document order are the fingerprint.
  *
  * Guarantees: any shared substring of length ≥ k + w − 1 contributes at
  * least one COMMON fingerprint (the winnowing theorem), and edits only
  * perturb fingerprints within w grams of the change — which is what makes
  * this the partial-overlap detector, where [[TextStatsExpr]]-style
  * whole-document hashing only catches exact duplicates. Map-only, one
  * primitive pass per row. */
case class WinnowFingerprintExpr(text: Expression, k: Expression, w: Expression)
  extends TernaryExpression with CodegenFallback {

  override def first: Expression = text
  override def second: Expression = k
  override def third: Expression = w
  override def prettyName: String = "graft_winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any, kAny: Any, wAny: Any): Any = {
    val kk = kAny.asInstanceOf[Int]
    val ww = wAny.asInstanceOf[Int]
    require(kk > 0 && ww > 0, "graft_winnow: k and w must be positive")
    // normalize: collapse whitespace runs to single spaces, lowercase —
    // fingerprints survive formatting noise (same normalization as
    // TextAnalysis.fingerprint)
    val raw = t.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0; var pendingSpace = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    val s = sb.toString
    val n = s.length
    if (n < kk) return new GenericArrayData(Array.empty[Long])
    // Rabin–Karp rolling hash, base 257, wrapping 64-bit arithmetic
    val B = 257L
    var bPow = 1L // B^(k-1)
    var j = 1
    while (j < kk) { bPow *= B; j += 1 }
    val nGrams = n - kk + 1
    val grams = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < kk) { h = h * B + s.charAt(i).toLong; i += 1 }
    grams(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - s.charAt(i - 1).toLong * bPow) * B + s.charAt(i + kk - 1).toLong
      grams(i) = h
      i += 1
    }
    // winnow: min of each window of ww gram hashes, rightmost on ties;
    // record only when the selection CHANGES position (paper's algorithm)
    val out = new scala.collection.mutable.ArrayBuffer[Long](16)
    val seen = new scala.collection.mutable.HashSet[Long]()
    var minPos = -1
    i = 0
    while (i < nGrams) {
      val lo = math.max(0, i - ww + 1)
      if (i < ww - 1) () // first full window not yet formed
      else if (minPos < lo) {
        // previous minimum slid out — rescan the window (amortized O(1))
        minPos = lo
        var p = lo + 1
        while (p <= i) { if (grams(p) <= grams(minPos)) minPos = p; p += 1 }
        if (seen.add(grams(minPos))) out += grams(minPos)
      } else if (grams(i) <= grams(minPos)) {
        minPos = i
        if (seen.add(grams(i))) out += grams(i)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFingerprintExpr =
    copy(text = f, k = s, w = t)
}

/** `graft_nfc(text)` → STRING: Unicode NFC normalization (canonical
  * composition) — the standard first step of corpus text cleaning: "é" as
  * e+COMBINING ACUTE and precomposed "é" must hash/shingle/dedup as the same
  * document. java.text.Normalizer is the JDK's ICU-correct implementation;
  * the x27 oracle compares against DuckDB's `nfc_normalize`, pinning
  * cross-engine agreement on the normalization itself. Already-NFC strings
  * (the common case) are detected with the quick-check and returned
  * as-is — no allocation on the hot path. */
case class NfcNormalizeExpr(text: Expression)
  extends UnaryExpression with CodegenFallback {

  override def child: Expression = text
  override def prettyName: String = "graft_nfc"
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(text = c)
}

/** `graft_deflate_len(text, level)` → INT: length in bytes of the
  * DEFLATE-compressed UTF-8 text — the Gopher/RefinedWeb-style
  * compression-ratio quality signal (boilerplate and repetition compress
  * far better than natural prose; ratio = deflate_len / byte_len). One
  * Deflater per evaluation, level foldable. No SQL oracle exists (DuckDB
  * exposes no per-row compressor) — pinned by a JVM spec against
  * java.util.zip directly. */
case class DeflateLenExpr(text: Expression, level: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = level
  override def prettyName: String = "graft_deflate_len"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: text must be STRING")
    else if (level.dataType != IntegerType || !level.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: level must be a foldable INT")
    else {
      val lv = level.eval(null)
      if (lv == null || lv.asInstanceOf[Int] < 0 || lv.asInstanceOf[Int] > 9)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: level must be 0..9, got $lv")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val lvl: Int = level.eval(null).asInstanceOf[Int]

  override def nullSafeEval(t: Any, l: Any): Any = {
    val bytes = t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val d = new java.util.zip.Deflater(lvl)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      Integer.valueOf(total)
    } finally d.end()
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DeflateLenExpr =
    copy(text = l, level = r)
}

/** `graft_bpe_tokens(text, merges)` → ARRAY<STRING>: apply learned BPE
  * merges ([[graft.operators.Bpe]]) — lowercase, whitespace pre-tokenize,
  * then per word greedily merge the LOWEST-RANK adjacent pair until none
  * applies (the standard BPE inference loop). `merges` is a foldable
  * ARRAY<ARRAY<STRING>> of [a, b] pairs in rank order, materialized to a
  * hash map once per task. Word-end symbols carry the training-time `</w>`
  * marker internally; the marker is stripped from the output tokens. */
case class BpeTokensExpr(text: Expression, merges: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = text
  override def right: Expression = merges
  override def prettyName: String = "graft_bpe_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: text must be STRING")
    else merges.dataType match {
      case ArrayType(ArrayType(StringType, _), _) if merges.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: merges must be a foldable ARRAY<ARRAY<STRING>>")
    }

  @transient private lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer]()
    val arr = merges.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      val pair = arr.getArray(i)
      val key = (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
      if (!m.containsKey(key)) m.put(key, i) // first (lowest) rank wins
      i += 1
    }
    m
  }

  private def applyWord(word: String, out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms = word.map(_.toString).toArray
    if (syms.isEmpty) return
    syms(syms.length - 1) += "</w>"
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.get((syms(j), syms(j + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge EVERY occurrence of the chosen pair in one sweep (matches
        // the training-side replacement and the driver reference in BpeSpec)
        val a = syms(bestAt); val b = syms(bestAt + 1)
        val merged = a + b
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            next += merged; k += 2
          } else { next += syms(k); k += 1 }
        }
        syms = next.toArray
      }
    }
    syms.foreach { s =>
      val cleaned = if (s.endsWith("</w>")) s.dropRight(4) else s
      if (cleaned.nonEmpty) out += UTF8String.fromString(cleaned)
    }
  }

  override def nullSafeEval(t: Any, m: Any): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    BpePreTokenize.foreachWord(t.toString)(w => applyWord(w, out))
    new GenericArrayData(out.toArray[AnyRef])
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BpeTokensExpr =
    copy(text = l, merges = r)
}

/** THE BPE pre-tokenization — one code path shared by training
  * ([[BpeWordsExpr]]) and application ([[BpeTokensExpr]]): Locale.ROOT case
  * fold, split on `Character.isWhitespace`. Keeping it in one place makes
  * train/apply skew on exotic whitespace (U+2028, U+3000) or
  * locale-sensitive case (Turkish dotted İ under a tr_TR JVM) impossible by
  * construction — round 6 trained through Java `\s+` + Spark `lower` while
  * applying through this split, two subtly different alphabets. */
private[plans] object BpePreTokenize {
  def foreachWord(raw: String)(f: String => Unit): Unit = {
    val s = raw.toLowerCase(java.util.Locale.ROOT)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || Character.isWhitespace(s.charAt(i))) {
        if (i > start) f(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
  }
}

/** `graft_bpe_words`: the BPE pre-tokenization exposed as its own map-only
  * expression, so [[graft.operators.Bpe.train]]'s distributed word count
  * sees EXACTLY the words the tokenizer will later apply merges to. */
case class BpeWordsExpr(text: Expression)
  extends UnaryExpression with CodegenFallback {

  override def child: Expression = text
  override def prettyName: String = "graft_bpe_words"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: text must be STRING")

  override def nullSafeEval(t: Any): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    BpePreTokenize.foreachWord(t.toString)(w => out += UTF8String.fromString(w))
    new GenericArrayData(out.toArray[AnyRef])
  }

  override protected def withNewChildInternal(c: Expression): BpeWordsExpr =
    copy(text = c)
}

/** `graft_unigram_tokens(text STRING, pieces ARRAY<STRING>, logps
  * ARRAY<DOUBLE>)` → `ARRAY<STRING>`: unigram-LM subword segmentation
  * [Kudo, ACL 2018] — per whitespace word (the shared
  * [[BpePreTokenize]] pre-tokenizer, so train/apply skew is impossible by
  * construction, same argument as BPE), the Viterbi-best piece sequence
  * under the model's per-piece log probabilities.
  *
  * The piece table ships as two parallel FOLDABLE literal arrays (built by
  * [[graft.operators.UnigramLm.tokens]]), evaluated once per executor into
  * a hash map — zero UDFs, map-only, fuses with the scan.
  *
  * Totality: training always retains every single character it saw, but an
  * apply-time word can still contain UNSEEN characters; the DP therefore
  * allows any single character as a fallback piece at `unkLogp` =
  * (min table logp − 10), so segmentation never fails and unseen
  * characters surface as their own tokens. Ties in the DP break toward the
  * SMALLEST start index (the longest final piece) — the driver reference
  * in [[graft.operators.UnigramLm.segmentWord]] implements the identical
  * loop, pinned equal in UnigramLmSpec. */
case class UnigramTokensExpr(text: Expression, pieces: Expression, logps: Expression)
  extends TernaryExpression with CodegenFallback {

  override def first: Expression = text
  override def second: Expression = pieces
  override def third: Expression = logps
  override def prettyName: String = "graft_unigram_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: text must be STRING")
    else (pieces.dataType, logps.dataType) match {
      case (ArrayType(StringType, _), ArrayType(DoubleType, _))
        if pieces.foldable && logps.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: pieces/logps must be foldable ARRAY<STRING>/ARRAY<DOUBLE>")
    }

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    val ps = pieces.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val ls = logps.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    require(ps.numElements() == ls.numElements(),
      s"$prettyName: pieces and logps must be the same length")
    var i = 0
    while (i < ps.numElements()) {
      m.putIfAbsent(ps.getUTF8String(i).toString, ls.getDouble(i))
      i += 1
    }
    m
  }
  @transient private lazy val maxPieceLen: Int = {
    var mx = 1
    table.keySet().forEach(k => if (k.length > mx) mx = k.length)
    mx
  }
  @transient private lazy val unkLogp: Double = {
    var mn = 0.0
    table.values().forEach(v => if (v < mn) mn = v)
    mn - 10.0
  }

  private def applyWord(word: String,
                        out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    val n = word.length
    if (n == 0) return
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxPieceLen)
      while (start < end) {
        if (best(start) != Double.NegativeInfinity) {
          val piece = word.substring(start, end)
          val lp = table.get(piece)
          val score =
            if (lp != null) best(start) + lp.doubleValue
            else if (end - start == 1) best(start) + unkLogp // unseen char fallback
            else Double.NegativeInfinity
          if (score > best(end)) { best(end) = score; back(end) = start }
        }
        start += 1
      }
      end += 1
    }
    // backtrack (collect reversed, then emit in order)
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = n
    while (at > 0) { val s = back(at); rev += word.substring(s, at); at = s }
    var i = rev.length - 1
    while (i >= 0) { out += UTF8String.fromString(rev(i)); i -= 1 }
  }

  override def nullSafeEval(t: Any, p: Any, l: Any): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    BpePreTokenize.foreachWord(t.toString)(w => applyWord(w, out))
    new GenericArrayData(out.toArray[AnyRef])
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, th: Expression): UnigramTokensExpr =
    copy(text = f, pieces = s, logps = th)
}
