package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: normalization,
  * tokenization, shingling, fingerprinting, language-ID heuristic, quality
  * metrics. All are composed from codegen'd built-ins (no UDFs) so they run
  * inside whole-stage codegen at scan speed — at 100 TB the text pass is
  * scan-bound and these add no shuffle.
  *
  * Every metric has an exact ANSI-SQL mirror (see TextQueries oracles):
  * normalization collapses whitespace first, then all tokenization is a
  * plain single-space split — this keeps Spark (Java regex) and any oracle
  * engine (RE2-style regex) bit-identical by construction.
  */
object TextFunctions {

  /** lowercase, collapse whitespace runs to single spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** tokens of the normalized text (single-space split). */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** k-token shingles from a token array column; docs shorter than k tokens
    * yield one shingle = the whole doc. Backed by the native WordShingles
    * expression: one O(tokens·k) pass, codegen'd — the compositional HOF
    * formulation (transform+slice+array_join) degrades to O(tokens²)
    * interpreted work per doc (see HashExpressions.WordShingles). */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    HashExpressions.word_shingles(toks, k)

  /** k-token shingles of raw text. */
  def shingles(text: Column, k: Int): Column =
    shinglesFromTokens(tokens(text), k)

  /** MD5 content fingerprint of the normalized text — cross-engine stable
    * (md5 is identical everywhere), the exact-dedup key. */
  def fingerprint_md5(text: Column): Column = md5(normalize(text))

  /** 64-bit rolling-hash fingerprint (native expression, no md5 cost). */
  def fingerprint64(text: Column): Column =
    HashExpressions.rolling_hash64(normalize(text))

  /** English stopword list used by the quality metrics (fixed, tiny). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "for", "on", "with", "as", "at", "by", "from")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: runs of letters, single digits, or single
    * non-alphanumeric glyphs — a cheap proxy for tokenizer cost. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(normalize(text), lit("[a-z]+|[0-9]|[^a-z0-9 ]"), lit(0)))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*)))

  /** count of punctuation/symbol chars in the normalized text. */
  def punctCount(text: Column): Column =
    length(normalize(text)) - length(regexp_replace(normalize(text), "[^a-z0-9 ]", ""))

  /** Marker-word sets for the language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pas"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "en", "no"))

  /** Language-ID heuristic: marker-token overlap, CJK codepoint check, else
    * English. (Synthetic corpora resolve to 'en'; the operator shape — a
    * branching classifier over token-set overlap — is what scales.) */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val byMarkers = langMarkers.foldLeft(when(lit(false), "")) {
      case (acc, (lang, markers)) =>
        acc.when(arrays_overlap(t, array(markers.map(lit): _*)), lang)
    }
    byMarkers
      .when(normalize(text).rlike("[\\u4e00-\\u9fff]"), "zh")
      .otherwise("en")
  }

  /** Composite quality score in [0,1]: length saturation, stopword presence,
    * low punctuation. Mirrors exactly in SQL (same literal arithmetic, same
    * evaluation order — IEEE doubles are engine-independent). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = stopwordCount(text).cast("double") / nTok
    val punctRatio = punctCount(text).cast("double") / length(normalize(text))
    least(nTok / lit(100.0), lit(1.0)) * lit(0.5) +
      stopRatio * lit(0.3) + (lit(1.0) - punctRatio) * lit(0.2)
  }

  // ---- PII detection / redaction ----
  // Patterns kept to the regex subset Java and RE2 (DuckDB) interpret
  // identically: character classes, bounded repetition, \b — no
  // lookaround/backrefs, so the oracle mirrors byte-for-byte. Map-only at
  // any scale (regex over each row; codegen'd string expressions).

  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "[IP]"),
    ("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "[PHONE]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"))

  /** match count for one PII category (name from [[piiPatterns]]). */
  def piiCount(text: Column, category: String): Column = {
    val p = piiPatterns.find(_._1 == category)
      .getOrElse(throw new IllegalArgumentException(category))._2
    size(regexp_extract_all(text, lit(p), lit(0)))
  }

  /** Replace every PII match with its category tag, all categories, in
    * [[piiPatterns]] order (SSN after phone: the narrower 3-2-4 shape is
    * not shadowed because the patterns are disjoint). */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (_, p, tag)) =>
      regexp_replace(acc, p, tag)
    }

  // ---- heuristic corpus filter rules (C4/Gopher-style) ----
  // Each rule is a boolean column; `keep` is their conjunction. All
  // map-only, mirrored in SQL with the same arithmetic.

  /** token count within [minWords, maxWords]. */
  def ruleWordCount(text: Column, minWords: Int = 30,
      maxWords: Int = 100000): Column = {
    val n = tokenCount(text)
    n.geq(minWords) && n.leq(maxWords)
  }

  /** mean token length within [3, 10] — gibberish / char-soup guard. */
  def ruleMeanWordLength(text: Column): Column = {
    val toks = tokens(text)
    val mean = length(concat_ws("", toks)).cast("double") / size(toks)
    mean.geq(3.0) && mean.leq(10.0)
  }

  /** at least `minDistinct` distinct stopwords present — the Gopher
    * "has common English function words" signal. */
  def ruleStopwords(text: Column, minDistinct: Int = 2): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(stopwords.map(lit): _*))).geq(minDistinct)

  /** symbol-to-token ratio below `maxRatio` (ellipsis/hash spam guard).
    * (The Gopher top-token-dominance signal lives in `q_diversity`'s
    * explode→groupBy formulation — per-row array counting would be
    * O(distinct × len) per doc, the wrong shape for long documents.) */
  def ruleSymbolRatio(text: Column, maxRatio: Double = 0.1): Column =
    (punctCount(text).cast("double") / tokenCount(text)).leq(maxRatio)

  // ---- C4-style cleaning (Raffel et al. 2020 §2.2) — web-scrape text
  // carries URLs, leftover markup, and non-sentence boilerplate lines;
  // all three scrubs are map-only regex/array built-ins (codegen'd, the
  // engine-portable regex subset the PII patterns already use).

  /** remove every http(s) URL. */
  def stripUrls(text: Column): Column =
    regexp_replace(text, "https?://\\S+", "")

  /** remove every <...> markup tag. */
  def stripHtml(text: Column): Column =
    regexp_replace(text, "<[^>]*>", "")

  /** C4's line gate: keep only lines ending in terminal punctuation
    * (. ! ? or a closing quote), dropping navigation/boilerplate lines. */
  def keepTerminalLines(text: Column): Column =
    array_join(filter(split(text, "\n"),
      l => l.rlike("[.!?\"]\\s*$")), "\n")

  /** FastText-style hashed linear document scorer: every token hashes
    * into one of 1001 weight slots via the engine-portable md5-prefix
    * hash, slots carry signed integer weights in [-500, 500], and the
    * document score is the MEAN token weight — the exact serving shape
    * of a hashed bag-of-words linear classifier (the quality-classifier
    * stage of most curation pipelines). The weights here derive from the
    * hash itself (a fixed pseudo-random model standing in for a trained
    * vector — swap `tokenWeight` for a broadcast lookup to serve real
    * weights; the plumbing is identical and the score stays
    * engine-exact: integer sums, one final double division). */
  def tokenWeight(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % 1001 - 500

  def hashedLinearScore(text: Column): Column = {
    val toks = tokens(text)
    val total = aggregate(transform(toks, t => tokenWeight(t)), lit(0L),
      (acc, w) => acc + w)
    when(size(toks) === 0, lit(0.0))
      .otherwise(total.cast("double") / size(toks).cast("double"))
  }
}
