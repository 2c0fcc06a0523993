package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar helpers for the training-data-pipeline operators
  * (tokenize / shingle / hash / quality / language-ID).
  *
  * Everything here is built from codegen'd built-ins — no UDFs — so the
  * whole text pipeline stays inside whole-stage codegen and is
  * deterministic across engines: the only hash primitive is md5, which
  * DuckDB computes identically, letting every query in TextPack /
  * DedupPack carry an exact SQL oracle.
  */
object TextFns {

  /** Whitespace tokens (the reference's documents are space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: runs of letters, runs of digits, or a single
    * non-space symbol — the usual pre-tokenizer split shape.
    */
  val RegexTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(RegexTokenPattern), lit(0))

  /** Deterministic 32-bit hash as a non-negative BIGINT, identical in
    * DuckDB as CAST('0x' || substr(md5(s), 1, 8) AS BIGINT).
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Distinct k-word shingles of a token array. */
  def wordShingles(toks: Column, k: Int): Column =
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
        .otherwise(array(concat_ws(" ", toks))))

  /** Universal-hash family over Z_P for MinHash: one md5 per shingle
    * (hash32), then cheap affine derivations per seed — 16 signatures
    * cost one string hash, not 16. Constants are plain literals, so the
    * oracle reconstructs them exactly.
    */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = ((i.toLong * 2654435761L) % (MinhashP - 1)) + 1
  def minhashB(i: Int): Long = (i.toLong * 40503L * 49979693L) % MinhashP

  /** MinHash value for seed `i`: min over shingles of
    * (a_i * (hash32(shingle) % P) + b_i) % P.
    */
  def minhash(shingles: Column, seed: Int): Column =
    array_min(transform(shingles,
      s => (lit(minhashA(seed)) * (hash32(s) % MinhashP) + minhashB(seed)) % MinhashP))

  /** LSH band key: md5 over `r` consecutive minhash values of band `b`
    * (bands laid out [b*r, (b+1)*r)). Identical string assembly on the
    * oracle side.
    */
  def bandKey(minhashes: Seq[Column], band: Int, r: Int): Column =
    md5(concat_ws(",", lit(band.toString) +: minhashes.slice(band * r, band * r + r): _*))

  /** 32-bit SimHash over the token multiset: bit j is 1 iff the count-
    * weighted sum of (2*bit_j(hash32(token)) - 1) is positive. Pure
    * integer arithmetic → exact in any engine. Runs through the native
    * codegen expression (expressions.SimHash32); requires
    * GraftFunctions.register on the session.
    */
  def simhash32(toks: Column): Column =
    call_function("graft_simhash32", transform(toks, t => hash32(t)))

  /** SimHash straight from text: the tokenize+md5 pass runs fused inside
    * one native eval (graft_token_hashes = ShingleHashes k=1,
    * non-distinct) instead of an interpreted per-token transform —
    * value-identical to `simhash32(tokens(text))`, ~4× cheaper on the
    * near-dup hot path.
    */
  def simhashText(text: Column): Column =
    call_function("graft_simhash32", call_function("graft_token_hashes", text))

  /** Rolling-hash document fingerprint: min hash32 over k-word shingles —
    * a 1-hash MinHash, the winnowing-style content fingerprint. Native
    * one-pass path (requires GraftFunctions.register on the session).
    */
  def fingerprint(text: Column, k: Int = 3): Column =
    element_at(
      call_function("graft_minhash_sig",
        call_function("graft_shingle_hashes", text, lit(k), lit(8)), lit(1)), 1)

  // ---- quality scoring ---------------------------------------------------

  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with", "by", "at")

  /** Fraction of tokens that are stopwords (0 when empty). */
  def stopwordRatio(toks: Column): Column = {
    val stops = size(filter(toks, t => t.isin(StopWords: _*)))
    when(size(toks) > 0, stops.cast("double") / size(toks)).otherwise(0.0)
  }

  /** Fraction of characters that are not alphanumeric or space. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^0-9A-Za-z ]", ""))).cast("double") / length(text))
      .otherwise(0.0)

  /** Mean token length in characters (0 when empty). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(0.0)

  /** Composite quality score in [0,1]: long-enough docs with low
    * punctuation and a moderate stopword share score high — the standard
    * heuristic-filter shape of large-scale corpus cleaning. No rounding:
    * the raw double is bitwise-reproducible (identical op order), while
    * round() semantics differ across engines.
    */
  def qualityScore(text: Column, toks: Column): Column = {
    val lenScore = least(size(toks).cast("double") / 50.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = lit(1.0) - abs(stopwordRatio(toks) - 0.3)
    (lenScore + punctScore + stopScore) / 3.0
  }

  // ---- language ID -------------------------------------------------------

  /** Marker unigrams per language (function-word profiles — the classic
    * n-gram/frequent-word language-ID heuristic).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "und", "die", "ist", "mit"),
    "fr" -> Seq("le", "et", "les", "est", "avec"),
    "es" -> Seq("el", "y", "los", "es", "con"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Predicted language: argmax of marker-token counts, ties broken by
    * language code order, score 0 everywhere → "und" (undetermined).
    */
  def langId(toks: Column): Column = {
    val scored = LangMarkers.map { case (lang, markers) =>
      (lang, size(filter(toks, t => t.isin(markers: _*))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lang).otherwise(acc)
    }
  }
}
