package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language ID, quality scoring, document
  * fingerprinting. All pure `Column` expressions (codegen'd by
  * Tungsten — no UDFs), so they stay inside WholeStageCodegen and
  * scale linearly with executors. */
object TextFunctions {

  /** Whitespace tokens, lowercased. */
  def tokens(c: Column): Column =
    split(lower(trim(c)), "\\s+")

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single
    * punctuation — the shape GPT-style tokenizers pre-split on. */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Character n-gram shingles (for MinHash / Jaccard). */
  def charShingles(c: Column, n: Int): Column = {
    val s = lower(trim(c))
    array_distinct(transform(
      sequence(lit(0), greatest(length(s) - n, lit(0))),
      i => substr(s, i + 1, lit(n))))
  }

  /** Word n-gram shingles. */
  /** Distinct word n-gram shingles. Native one-pass expression: the
    * HOF spelling (`array_distinct(transform(sequence(...), i =>
    * concat_ws(" ", slice(t, i+1, n))))`) re-evaluates the tokenizer
    * regex per lambda element — O(tokens²) per row and the measured
    * floor under every shingle-based gate. Identical output. */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.WordShingles(
        org.apache.spark.sql.graft.ColumnInternals.expression(tokens(c)), n))

  /** Content-defined span blocks (anchored ExactSubstr boundaries) of
    * the whitespace tokens of `c` — array<struct<p,b>>; see
    * [[org.apache.spark.sql.graft.SketchExpressions.AnchoredSpanBlocks]]
    * for the exact rule and why it is a native one-pass expression. */
  def anchoredSpanBlocks(c: Column, maxBlockTokens: Int, anchorMod: Int): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.AnchoredSpanBlocks(
        org.apache.spark.sql.graft.ColumnInternals.expression(tokens(c)),
        maxBlockTokens, anchorMod))

  /** Repetitiveness: 1 − (#distinct word bigrams / #word bigrams) —
    * 0 for fully novel text, → 1 for looping boilerplate. The standard
    * cheap quality signal for filtering templated/generated spam from
    * training corpora; engine-portable arithmetic (list_distinct). */
  def repetitionScore(c: Column): Column =
    round(org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.BigramRepetition(
        org.apache.spark.sql.graft.ColumnInternals.expression(tokens(c)))), 6)

  /** PII redaction: emails then phone-number runs replaced with typed
    * placeholder tags. Patterns are RE2-safe (no backreferences or
    * lookaround) so any RE2-based engine — and the DuckDB oracle —
    * applies them identically. Order matters: emails first, or a
    * phone-like digit run inside an address would split it. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(email, "\\+?[0-9][0-9()\\-\\s]{6,}[0-9]", "<PHONE>")
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "for", "on", "with", "as", "at", "by", "be"),
    "fr" -> Seq("le", "la", "les", "un", "une", "des", "et", "ou", "de",
      "dans", "est", "que", "pour", "sur", "avec", "par"),
    "es" -> Seq("el", "la", "los", "las", "un", "una", "y", "o", "de",
      "en", "es", "que", "para", "con", "por"),
    "de" -> Seq("der", "die", "das", "ein", "eine", "und", "oder", "von",
      "in", "ist", "dass", "für", "auf", "mit", "bei"),
    "zh" -> Seq("的", "了", "和", "是", "在", "我", "有", "他", "这", "中"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(c: Column, lang: String): Column =
    stopwordRatioTokens(tokens(c), lang)

  /** Same over a precomputed token array — callers scoring several
    * languages (langId, quality) tokenize once instead of per score. */
  def stopwordRatioTokens(t: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(t) > 0,
      size(filter(t, x => array_contains(sw, x))).cast("double") / size(t))
      .otherwise(lit(0.0))
  }

  /** The languages [[langIdTokens]] scores, sorted (tie-break order). */
  val langIdLanguages: Seq[String] = stopwords.keys.toSeq.sorted

  /** All [[langIdLanguages]] stopword ratios in ONE pass over the token
    * array (native expression; element i aligns with langIdLanguages).
    * Each token costs one hash probe against a combined
    * token→language-bitmask map — the per-language `filter` HOF form
    * re-scans the array per language with a linear `array_contains`
    * per token, and was the annotate stage's dominant cost. Same
    * arithmetic (hits / totalTokens, 0.0 on empty/null). */
  def stopwordRatiosAll(t: Column): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.StopwordRatios(
        org.apache.spark.sql.graft.ColumnInternals.expression(t),
        langIdLanguages.map(stopwords(_))))

  /** N-gram/stopword-heuristic language ID: highest stopword-hit ratio
    * wins; deterministic tie-break by language code. Returns a language
    * code column ("und" when nothing matches). */
  def langId(c: Column): Column = langIdTokens(tokens(c))

  def langIdTokens(t: Column): Column =
    langIdFromRatios(langIdLanguages.map(l => (l, stopwordRatioTokens(t, l))))

  /** Argmax over precomputed per-language ratio columns. Pipelines that
    * stage each ratio as a real column (one `filter` HOF pass per
    * language) should use this: inlining the ratios into the argmax
    * expression tree re-evaluates every interpreted HOF ~3× (greatest
    * chain + per-language comparison). */
  def langIdFromRatios(scored: Seq[(String, Column)]): Column = {
    val best = scored.map(_._2).reduce(greatest(_, _))
    scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Heuristic quality score in [0,1]: balanced length, healthy
    * alpha/punctuation mix, stopword presence, sane mean word length —
    * the classic pre-training corpus filters (C4-style). */
  def qualityScore(c: Column): Column = qualityScoreTokens(c, tokens(c))

  def qualityScoreTokens(c: Column, t: Column): Column =
    qualityScoreWithSw(c, t, stopwordRatioTokens(t, "en"))

  /** Quality score with the English stopword ratio supplied as a
    * (usually pre-staged) column — shared with langId's ratio columns
    * so the token array is HOF-scanned once, not once per score. */
  def qualityScoreWithSw(c: Column, t: Column, enRatio: Column): Column = {
    val nChars = length(c).cast("double")
    val nTokens = size(t).cast("double")
    val meanWordLen = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val alphaChars = length(regexp_replace(c, "[^A-Za-z]", "")).cast("double")
    val alphaRatio = when(nChars > 0, alphaChars / nChars).otherwise(lit(0.0))
    val lenScore = least(nTokens / lit(64.0), lit(1.0))
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), lit(1.0)).otherwise(lit(0.5))
    val swScore = least(enRatio * 5.0, lit(1.0))
    round(lenScore * 0.35 + alphaRatio * 0.3 + wordLenScore * 0.2 + swScore * 0.15, 6)
  }

  /** Rolling hash over tokens (Karp-Rabin-style document fingerprint):
    * an xxhash64 chain — order-sensitive, deterministic, and free of
    * the 64-bit multiply that ANSI mode rejects on overflow. */
  def fingerprint(c: Column): Column = fingerprintTokens(tokens(c))

  /** [[fingerprint]] over an already-tokenized column (the annotate
    * stage computes tokens once and feeds every score from them). */
  def fingerprintTokens(t: Column): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.ChainHash64(
        org.apache.spark.sql.graft.ColumnInternals.expression(t)))

  /** Engine-portable rolling fingerprint: an md5 fold over tokens.
    * Same order-sensitivity as [[fingerprint]] but reproducible in any
    * engine with md5 (DuckDB: `list_reduce` with the same seed), so it
    * can sit under a differential oracle. Prefer [[fingerprint]] in hot
    * paths — xxhash64 avoids the per-token hex-string materialization. */
  def fingerprintPortable(c: Column): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.Md5Fold(
        org.apache.spark.sql.graft.ColumnInternals.expression(tokens(c)), "fp0"))

  /** Engine-portable 64-bit token hash: the first 16 hex chars of
    * md5 read big-endian, assembled from two 32-bit halves so neither
    * side ever parses an out-of-long-range value. DuckDB replica:
    * `(('0x'||substr(md5(t),1,8))::BIGINT << 32) |
    *  ('0x'||substr(md5(t),9,8))::BIGINT` (halves stay non-negative,
    * so `>>`/`&` bit probes are sign-safe in both engines). Prefer
    * xxhash64 in hot paths — this exists to let sketch gates sit under
    * a DuckDB differential. */
  def md5Hash64(c: Column): Column = {
    val d = md5(c)
    shiftleft(conv(substring(d, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(d, 9, 8), 16, 10).cast("long"))
  }

  /** MinHash signature: k independent permutations approximated by
    * seeded xxhash64 over the shingle set; element i = min over
    * shingles of hash(shingle, seed=i). */
  def minhashSignature(shinglesCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(i))))): _*)

  /** SimHash-64 from a token array: bit i of the result is the sign of
    * Σ_tokens (2·bit_i(hash(token)) − 1). Pure expression — no shuffle. */
  def simhash64(
      tokensCol: Column,
      tokenHash: Column => Column = xxhash64(_)): Column = {
    val sums = (0 until 64).map { i =>
      aggregate(tokensCol, lit(0L),
        (acc, t) => acc + (shiftright(tokenHash(t), i).bitwiseAND(1L) * 2L - 1L))
    }
    sums.zipWithIndex.map { case (s, i) =>
      when(s > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Canonical text cleanup (NFC, zero-width removal, separator/
    * control collapse, trim, optional lowercase) — see
    * [[org.apache.spark.sql.graft.SketchExpressions.NormalizeText]]. */
  def normalizeText(c: Column, lowercase: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnInternals.column(
      org.apache.spark.sql.graft.SketchExpressions.NormalizeText(
        org.apache.spark.sql.graft.ColumnInternals.expression(c), lowercase))
}
