package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis queries over the documents table (the north-star
  * training-data surface), each with an exact DuckDB oracle. The shared SQL
  * normalization prelude mirrors TextFunctions.normalize/tokens exactly:
  * lower → collapse whitespace (global!) → trim → single-space split.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  // DuckDB mirrors of the TextFunctions primitives (shared, see OracleSql)
  private val normSql = OracleSql.norm
  private val toksSql = OracleSql.toks
  private val stopsSql = stopwords.map(s => s"'$s'").mkString("(", ",", ")")
  private val stopsArrSql = stopwords.map(s => s"'$s'").mkString("[", ",", "]")

  /** doc corpus stats: count/char volume per (lang, source). */
  val qDocStats: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("source"))
  }
  val qDocStatsSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** token counting: whitespace tokens + BPE-ish subword count. */
  val qTokenCount: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        // long, matching DuckDB len()'s BIGINT (schema-compare exactness)
        tokenCount(col("text")).cast("long").as("n_tokens"),
        bpeTokenCount(col("text")).cast("long").as("n_bpe"))
      .orderBy(col("doc_id"))
  }
  val qTokenCountSql: String =
    s"""SELECT doc_id,
       |  len($toksSql) AS n_tokens,
       |  len(regexp_extract_all($normSql, '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_bpe
       |FROM documents ORDER BY doc_id""".stripMargin

  /** quality metrics + composite score (IEEE-exact mirrored arithmetic). */
  val qQuality: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        stopwordCount(col("text")).cast("long").as("n_stop"),
        punctCount(col("text")).cast("long").as("n_punct"),
        qualityScore(col("text")).as("score"))
      .orderBy(col("doc_id"))
  }
  val qQualitySql: String =
    s"""SELECT doc_id, n_tokens, n_stop, n_punct,
       |  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
       |    + (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
       |    + (1.0 - CAST(n_punct AS DOUBLE) / len(norm)) * 0.2 AS score
       |FROM (
       |  SELECT doc_id, $normSql AS norm,
       |    len($toksSql) AS n_tokens,
       |    len(list_filter($toksSql, t -> t IN $stopsSql)) AS n_stop,
       |    len($normSql) - len(regexp_replace($normSql, '[^a-z0-9 ]', '', 'g')) AS n_punct
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** language-ID heuristic vs the labeled lang: confusion counts. */
  val qLangId: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .select(col("lang"), langId(col("text")).as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }
  val qLangIdSql: String = {
    val markerCases = langMarkers.map { case (lang, ms) =>
      val arr = ms.map(m => s"'$m'").mkString("[", ",", "]")
      s"WHEN len(list_intersect($toksSql, $arr)) > 0 THEN '$lang'"
    }.mkString("\n      ")
    s"""SELECT lang, predicted, COUNT(*) AS n FROM (
       |  SELECT lang, CASE
       |      $markerCases
       |      WHEN regexp_matches($normSql, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |      ELSE 'en' END AS predicted
       |  FROM documents)
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  /** document fingerprints: md5 of normalized content (cross-engine) plus
    * the native rolling-hash (checked by ScalaTest, not the oracle — DuckDB
    * has no FNV; we still emit it to exercise the codegen'd expression). */
  val qFingerprint: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), fingerprint_md5(col("text")).as("fp_md5"))
      .orderBy(col("doc_id"))
  }
  val qFingerprintSql: String =
    s"""SELECT doc_id, md5($normSql) AS fp_md5
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus term statistics (the inverted-index / TF-IDF precursor):
    * document frequency + collection frequency per token, top 50 by df.
    * All integer counts — exact. */
  val qTermStats: Q = (s, dir) => {
    val toks = Tables.load(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("token"))
    toks.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("cf"))
      .orderBy(col("df").desc, col("cf").desc, col("token"))
      .limit(50)
  }
  val qTermStatsSql: String =
    s"""SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
       |FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
       |GROUP BY token
       |ORDER BY df DESC, cf DESC, token LIMIT 50""".stripMargin

  /** BM25 keyword relevance over the corpus (k1=1.2, b=0.75) — the
    * retrieval-scoring step of a training-data curation pipeline, built
    * on the q_term_stats inverted-index precursor. Engine-exactness by
    * construction: a RATIONAL idf ((N - df + 0.5)/(df + 0.5), the BM25
    * idf argument without the log — monotone, so ranking-equivalent)
    * keeps every operation an exactly-rounded IEEE +,-,*,/; per-term
    * contributions are summed in a FIXED literal order (float addition
    * is not associative, and a grouped SUM's order is nondeterministic
    * across engines and runs — each conditional sum below aggregates at
    * most ONE row per doc, so it is order-free). At 100 TB: one explode
    * + two shuffles (doc-term group, per-doc pivot), term filter pushed
    * below the explode's shuffle, corpus stats broadcast as 1-row
    * aggregates. */
  val qBm25: Q = (s, dir) => {
    val terms = Seq("data", "join", "spark")
    val docs = Tables.load(s, dir, "documents")
    val dl = docs.select(col("doc_id"),
      tokenCount(col("text")).cast("long").as("dl"))
    val corpus = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    // barrier: tf feeds BOTH the df aggregate and the scoring join — an
    // unmaterialized plan would tokenize the corpus twice
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .localCheckpoint()
    val dft = tf.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    val idf = (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val denom = col("tf") + lit(1.2) * (lit(0.25) +
      lit(0.75) * (col("dl").cast("double") / col("avgdl")))
    val contrib = tf.join(dft, "token").join(dl, "doc_id")
      .crossJoin(corpus)
      .withColumn("c", (idf * (col("tf") * lit(2.2))) / denom)
    contrib.groupBy(col("doc_id"))
      .agg(sum(when(col("token") === "data", col("c"))).as("c_data"),
        sum(when(col("token") === "join", col("c"))).as("c_join"),
        sum(when(col("token") === "spark", col("c"))).as("c_spark"))
      .select(col("doc_id"),
        coalesce(col("c_data"), lit(0.0)).as("s_data"),
        coalesce(col("c_join"), lit(0.0)).as("s_join"),
        coalesce(col("c_spark"), lit(0.0)).as("s_spark"),
        (coalesce(col("c_data"), lit(0.0)) +
          coalesce(col("c_join"), lit(0.0)) +
          coalesce(col("c_spark"), lit(0.0))).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(50)
  }
  val qBm25Sql: String =
    s"""WITH dl AS (SELECT doc_id, len($toksSql) AS dl FROM documents),
       |corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |  CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM dl),
       |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents) t
       |  WHERE token IN ('data', 'join', 'spark')
       |  GROUP BY doc_id, token),
       |dft AS (SELECT token,
       |  CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY token),
       |contrib AS (SELECT tf.doc_id, tf.token,
       |  (((n - df + 0.5) / (df + 0.5)) * (tf * 2.2))
       |    / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / avgdl))) AS c
       |  FROM tf JOIN dft USING (token) JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN corpus),
       |scored AS (SELECT doc_id,
       |  SUM(c) FILTER (token = 'data') AS c_data,
       |  SUM(c) FILTER (token = 'join') AS c_join,
       |  SUM(c) FILTER (token = 'spark') AS c_spark
       |  FROM contrib GROUP BY doc_id)
       |SELECT doc_id,
       |  COALESCE(c_data, 0.0) AS s_data,
       |  COALESCE(c_join, 0.0) AS s_join,
       |  COALESCE(c_spark, 0.0) AS s_spark,
       |  COALESCE(c_data, 0.0) + COALESCE(c_join, 0.0)
       |    + COALESCE(c_spark, 0.0) AS score
       |FROM scored ORDER BY score DESC, doc_id LIMIT 50""".stripMargin

  /** Gopher-style repetition/diversity quality signals: distinct-token
    * ratio and most-common-token share per document (the "repetitious
    * text" filters of web-corpus curation). Integer counts + mirrored
    * IEEE division — engine-exact. One explode + two exact-count
    * shuffles; at 100 TB the per-(doc,token) group is the only wide
    * stage and it combines map-side. */
  val qDiversity: Q = (s, dir) => {
    val per = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
    per.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("max_cnt"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        (col("max_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("top_share"))
      .orderBy(col("doc_id"))
  }
  val qDiversitySql: String =
    s"""WITH per AS (
       |  SELECT doc_id, token, COUNT(*) AS c
       |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
       |  GROUP BY doc_id, token),
       |agg AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    COUNT(*) AS n_distinct, MAX(c) AS max_cnt
       |  FROM per GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_distinct, max_cnt,
       |  CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    AS distinct_ratio,
       |  CAST(max_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_share
       |FROM agg ORDER BY doc_id""".stripMargin

  /** PII detection + redaction (training-data scrubbing): deterministic
    * PII is planted per doc (email for id%3=0, IP + phone for id%3=1,
    * none for id%3=2), detected by category, and redacted; the oracle
    * mirrors the planting arithmetic AND the same RE2/Java-common
    * regexes, comparing counts plus an md5 of the redacted text — so a
    * hash match proves detection AND redaction byte-for-byte. Map-only
    * at any scale (codegen'd regex over each row). */
  val qPiiRedact: Q = (s, dir) => {
    import graft.functions.TextFunctions._
    val planted = Tables.load(s, dir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now")))
          .when(col("doc_id") % 3 === 1,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit(".7 call 555-123-4567")))
          .otherwise(lit(""))))
    planted.select(col("doc_id"),
      piiCount(col("text"), "email").cast("long").as("n_email"),
      piiCount(col("text"), "ipv4").cast("long").as("n_ip"),
      piiCount(col("text"), "phone").cast("long").as("n_phone"),
      piiCount(col("text"), "ssn").cast("long").as("n_ssn"),
      md5(redactPii(col("text"))).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }
  val qPiiRedactSql: String = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val phone = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
    val ssn = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
    s"""WITH planted AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0
       |           THEN ' contact user' || doc_id || '@example.com now'
       |         WHEN doc_id % 3 = 1
       |           THEN ' from 10.0.' || (doc_id % 256) || '.7 call 555-123-4567'
       |         ELSE '' END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '$email')) AS n_email,
       |  len(regexp_extract_all(text, '$ipv4')) AS n_ip,
       |  len(regexp_extract_all(text, '$phone')) AS n_phone,
       |  len(regexp_extract_all(text, '$ssn')) AS n_ssn,
       |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    text, '$email', '[EMAIL]', 'g'), '$ipv4', '[IP]', 'g'),
       |    '$phone', '[PHONE]', 'g'), '$ssn', '[SSN]', 'g')) AS redacted_md5
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  /** C4/Gopher-style heuristic filter rules: per-doc booleans (word-count
    * window, mean word length, distinct-stopword floor, symbol ratio) and
    * the conjunction `keep` — the corpus-curation gate, map-only. */
  val qFilterRules: Q = (s, dir) => {
    import graft.functions.TextFunctions._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        ruleWordCount(col("text")).as("r_words"),
        ruleMeanWordLength(col("text")).as("r_wordlen"),
        ruleStopwords(col("text")).as("r_stop"),
        ruleSymbolRatio(col("text")).as("r_symbol"))
      .withColumn("keep",
        col("r_words") && col("r_wordlen") && col("r_stop") && col("r_symbol"))
      .orderBy(col("doc_id"))
  }
  val qFilterRulesSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, $normSql AS norm, $toksSql AS toks FROM documents),
       |r AS (
       |  SELECT doc_id,
       |    len(toks) AS n_tok,
       |    len(replace(norm, ' ', '')) AS n_chars,
       |    len(list_distinct(list_intersect(toks, $stopsArrSql))) AS n_stopd,
       |    len(norm) - len(regexp_replace(norm, '[^a-z0-9 ]', '', 'g'))
       |      AS n_punct
       |  FROM m)
       |SELECT doc_id,
       |  n_tok >= 30 AND n_tok <= 100000 AS r_words,
       |  CAST(n_chars AS DOUBLE) / n_tok >= 3.0
       |    AND CAST(n_chars AS DOUBLE) / n_tok <= 10.0 AS r_wordlen,
       |  n_stopd >= 2 AS r_stop,
       |  CAST(n_punct AS DOUBLE) / n_tok <= 0.1 AS r_symbol,
       |  (n_tok >= 30 AND n_tok <= 100000)
       |    AND (CAST(n_chars AS DOUBLE) / n_tok >= 3.0
       |         AND CAST(n_chars AS DOUBLE) / n_tok <= 10.0)
       |    AND n_stopd >= 2
       |    AND CAST(n_punct AS DOUBLE) / n_tok <= 0.1 AS keep
       |FROM r ORDER BY doc_id""".stripMargin

  /** Gopher-style intra-document repetition signals (Rae et al. 2021
    * table A1): top-bigram / top-trigram char coverage, duplicate-5-gram
    * char coverage, plus the line-level signals (0 on this single-line
    * corpus; pinned on multi-line docs by TextExpressionsSpec), and the
    * keep conjunction at the paper's thresholds. One native-expression
    * pass per row — map-only at any corpus size (no explode/groupBy
    * shuffle). Every frac is exact-int numerator / exact-int denominator
    * with one double division, so the oracle reproduces it bit-exactly. */
  val qRepetition: Q = (s, dir) => {
    import graft.functions.TextExpressions._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        ngram_repetition(tokens(col("text")), 2).as("g2"),
        ngram_repetition(tokens(col("text")), 3).as("g3"),
        ngram_repetition(tokens(col("text")), 5).as("g5"),
        line_repetition(col("text")).as("ln"))
      .select(col("doc_id"),
        col("g2.top_char_frac").as("top2_frac"),
        col("g3.top_char_frac").as("top3_frac"),
        col("g5.dup_char_frac").as("dup5_frac"),
        col("ln.dup_line_frac").as("dup_line_frac"),
        col("ln.dup_line_char_frac").as("dup_line_char_frac"))
      .withColumn("keep",
        col("top2_frac") <= 0.20 && col("top3_frac") <= 0.18 &&
          col("dup5_frac") <= 0.15 && col("dup_line_frac") <= 0.30)
      .orderBy(col("doc_id"))
  }
  val qRepetitionSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, $toksSql AS t, len($normSql) AS total FROM documents),
       |grams AS (
       |  SELECT doc_id, n, total,
       |    CASE WHEN len(t) < n THEN [] ELSE list_transform(
       |      range(0, len(t) - n + 1),
       |      i -> array_to_string(t[i+1:i+n], ' ')) END AS gs
       |  FROM m, (SELECT unnest([2, 3, 5]) AS n)),
       |cnts AS (
       |  SELECT doc_id, n, total, g AS gram, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, n, total, unnest(gs) AS g FROM grams)
       |  GROUP BY ALL),
       |ranked AS (
       |  SELECT doc_id, n, total, cnt, len(gram) AS glen,
       |    row_number() OVER (PARTITION BY doc_id, n
       |      ORDER BY cnt DESC, len(gram) DESC) AS rn
       |  FROM cnts),
       |tops AS (
       |  SELECT doc_id, n, CASE WHEN total = 0 THEN 0.0
       |    ELSE CAST(cnt * glen AS DOUBLE) / CAST(total AS DOUBLE) END
       |    AS top_frac
       |  FROM ranked WHERE rn = 1),
       |dups AS (
       |  SELECT doc_id, n,
       |    CASE WHEN any_value(total) = 0 THEN 0.0 ELSE
       |      CAST(COALESCE(SUM(cnt * len(gram)) FILTER (WHERE cnt > 1), 0)
       |           AS DOUBLE) / CAST(any_value(total) AS DOUBLE) END AS dup_frac
       |  FROM cnts GROUP BY doc_id, n)
       |SELECT m.doc_id,
       |  COALESCE(p2.top_frac, 0.0) AS top2_frac,
       |  COALESCE(p3.top_frac, 0.0) AS top3_frac,
       |  COALESCE(p5.dup_frac, 0.0) AS dup5_frac,
       |  CAST(0.0 AS DOUBLE) AS dup_line_frac,
       |  CAST(0.0 AS DOUBLE) AS dup_line_char_frac,
       |  COALESCE(p2.top_frac, 0.0) <= 0.20
       |    AND COALESCE(p3.top_frac, 0.0) <= 0.18
       |    AND COALESCE(p5.dup_frac, 0.0) <= 0.15 AND TRUE AS keep
       |FROM m
       |LEFT JOIN tops p2 ON m.doc_id = p2.doc_id AND p2.n = 2
       |LEFT JOIN tops p3 ON m.doc_id = p3.doc_id AND p3.n = 3
       |LEFT JOIN dups p5 ON m.doc_id = p5.doc_id AND p5.n = 5
       |ORDER BY m.doc_id""".stripMargin

  /** Inverted-index build: per term, document frequency, total term
    * frequency, and the full POSTING LIST (sorted doc ids) — the retrieval
    * data structure BM25 serving would load. Posting lists are the one
    * index shape worth materializing from Spark (one groupBy; map-side
    * partial aggregation collapses per-doc duplicates before the
    * shuffle); sort_array makes the list order engine-independent. */
  val qInvertedIndex: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        // CSV-serialized sorted posting list: keeps the compare surface
        // scalar (the drivers hash cell values, not nested lists)
        concat_ws(",", sort_array(collect_list(col("doc_id"))))
          .as("postings"))
      .orderBy(col("term"))
  }
  val qInvertedIndexSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term)
       |SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
       |  string_agg(doc_id, ',' ORDER BY doc_id) AS postings
       |FROM tf GROUP BY term ORDER BY term""".stripMargin

  /** C4-style cleaning over deterministically-dirtied docs: plant a URL,
    * markup tags, or a terminal-punctuation-less boilerplate line per doc
    * (mod-4 cycle, like q_pii_redact's planting), then scrub with
    * stripUrls → stripHtml → keepTerminalLines and oracle the cleaned md5
    * plus per-category hit counts. All map-only. */
  val qC4Clean: Q = (s, dir) => {
    import graft.functions.TextFunctions._
    val planted = Tables.load(s, dir, "documents")
      .withColumn("text", concat(col("text"), lit("."),
        when(col("doc_id") % 4 === 0,
          concat(lit(" see http://ex"), col("doc_id").cast("string"),
            lit("/x now.")))
          .when(col("doc_id") % 4 === 1, lit(" <div class=\"x\">mark</div> ok."))
          .when(col("doc_id") % 4 === 2,
            concat(lit("\nmenu home about\nEnds well, doc "),
              col("doc_id").cast("string"), lit(".")))
          .otherwise(lit(""))))
    planted.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("https?://\\S+"), lit(0)))
        .cast("long").as("n_urls"),
      size(regexp_extract_all(col("text"), lit("<[^>]*>"), lit(0)))
        .cast("long").as("n_tags"),
      size(split(col("text"), "\n")).cast("long").as("n_lines"),
      md5(keepTerminalLines(stripHtml(stripUrls(col("text")))))
        .as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }
  val qC4CleanSql: String =
    """WITH planted AS (
      |  SELECT doc_id, text || '.' ||
      |    CASE WHEN doc_id % 4 = 0
      |           THEN ' see http://ex' || doc_id || '/x now.'
      |         WHEN doc_id % 4 = 1 THEN ' <div class="x">mark</div> ok.'
      |         WHEN doc_id % 4 = 2
      |           THEN chr(10) || 'menu home about' || chr(10) ||
      |                'Ends well, doc ' || doc_id || '.'
      |         ELSE '' END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, 'https?://\S+')) AS BIGINT)
      |    AS n_urls,
      |  CAST(len(regexp_extract_all(text, '<[^>]*>')) AS BIGINT) AS n_tags,
      |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
      |  md5(array_to_string(
      |    list_filter(string_split(
      |      regexp_replace(regexp_replace(text, 'https?://\S+', '', 'g'),
      |        '<[^>]*>', '', 'g'), chr(10)),
      |      l -> regexp_matches(l, '[.!?"]\s*$')), chr(10))) AS cleaned_md5
      |FROM planted ORDER BY doc_id""".stripMargin

  /** Hashed-linear classifier scoring (fastText serving shape): mean
    * signed token weight from a 1001-slot hashed weight vector, and the
    * keep decision at score > 0. Map-only; integer sums with one final
    * division keep the score engine-exact. */
  val qQualityClassifier: Q = (s, dir) => {
    import graft.functions.TextFunctions._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), hashedLinearScore(col("text")).as("score"))
      .withColumn("keep", col("score") > 0.0)
      .orderBy(col("doc_id"))
  }
  val qQualityClassifierSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN len(t) = 0 THEN 0.0 ELSE
       |    CAST(list_sum(list_transform(t,
       |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1001 - 500))
       |      AS DOUBLE) / CAST(len(t) AS DOUBLE) END AS score,
       |  CASE WHEN len(t) = 0 THEN 0.0 ELSE
       |    CAST(list_sum(list_transform(t,
       |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1001 - 500))
       |      AS DOUBLE) / CAST(len(t) AS DOUBLE) END > 0.0 AS keep
       |FROM (SELECT doc_id, $toksSql AS t FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Corpus-trained bigram LM scoring — the language-model quality
    * filter's serving shape (score docs by how typical their word
    * transitions are for the corpus). Doc score = mean over transitions
    * of P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1}·), with each ratio
    * quantized onto an integer 1e-6 grid (exact integer `div`) so the
    * per-doc sum is ORDER-FREE and the oracle reproduces it exactly.
    * Scale shape: transitions come straight off the token array (one
    * Generate, no token self-join); bigram/unigram tables are two
    * partial-agg groupBys; scoring is two equi-joins + one per-doc
    * aggregation. */
  val qLmScore: Q = (s, dir) => {
    val docs = Tables.load(s, dir, "documents")
    // transitions straight from the token array (one Generate — never a
    // token-stream self-join, which would shuffle the corpus twice)
    val t = tokens(col("text"))
    val trans = docs.select(col("doc_id"),
      explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = trans.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val bi = trans.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // per-transition ratio quantized to an integer 1e-6 grid (exact SQL
    // `div`) so the per-doc sum is order-free — a double ratio sum would
    // depend on aggregation order and break the oracle
    trans.join(bi, Seq("w1", "w2")).join(uni, Seq("w1"))
      .withColumn("q_ratio", expr("(c2 * 1000000L) div c1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trans"), sum(col("q_ratio")).as("q_sum"))
      .select(col("doc_id"), col("n_trans"),
        (col("q_sum").cast("double") / lit(1e6) /
          col("n_trans").cast("double")).as("avg_prob"))
      .orderBy(col("doc_id"))
  }
  val qLmScoreSql: String =
    s"""WITH m AS (SELECT doc_id, $toksSql AS t FROM documents),
       |idx AS (SELECT doc_id, t,
       |  unnest(range(1, len(t))) AS i FROM m),
       |trans AS (
       |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
       |uni AS (SELECT w1, COUNT(*) AS c1 FROM trans GROUP BY w1),
       |bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM trans GROUP BY w1, w2)
       |SELECT doc_id, COUNT(*) AS n_trans,
       |  CAST(SUM((c2 * 1000000) // c1) AS DOUBLE) / 1e6
       |    / CAST(COUNT(*) AS DOUBLE) AS avg_prob
       |FROM trans JOIN bi USING (w1, w2) JOIN uni USING (w1)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Top-K corpus vocabulary + per-doc out-of-vocabulary rate — the
    * tokenizer-coverage check a training pipeline runs before committing
    * to a vocab. Scale shape: ONE token-keyed groupBy builds the
    * frequency table (map-side partial), the top-K cut is a
    * deterministic total order (count DESC, token ASC — ties at the
    * boundary cannot flip the set), the K-row vocab BROADCASTS to mark
    * tokens map-side, and the per-doc rollup partial-aggregates before
    * its doc-keyed exchange. */
  val qVocabOov: Q = (s, dir) => {
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(16)
      .select(col("tok"), lit(1).as("iv"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tok"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tok").cast("double"))
          .as("oov_frac"))
      .orderBy("doc_id")
  }
  val qVocabOovSql: String =
    s"""WITH m AS (SELECT doc_id, $toksSql AS t FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS tok FROM m
       |        WHERE len(t) > 0 AND t[1] <> ''),
       |v AS (SELECT tok FROM (
       |        SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok)
       |      ORDER BY n DESC, tok ASC LIMIT 16),
       |d AS (SELECT t.doc_id, COUNT(*) AS n_tok,
       |        CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
       |          AS BIGINT) AS n_oov
       |      FROM tok t LEFT JOIN v ON t.tok = v.tok
       |      GROUP BY t.doc_id)
       |SELECT doc_id, n_tok, n_oov,
       |  CAST(n_oov AS DOUBLE) / CAST(n_tok AS DOUBLE) AS oov_frac
       |FROM d ORDER BY doc_id""".stripMargin

  /** Exact corpus length quantiles per language (p25/p50/p75/p90 of
    * n_chars) — the length-distribution audit behind truncation/packing
    * decisions. Exact interpolated percentiles (Spark `percentile` ≡
    * DuckDB `quantile_cont`), rounded to 4 decimals so both engines'
    * double representations agree; at 100 TB the same query would swap
    * in percentile_approx/t-digest, which an exact oracle cannot pin —
    * the exact form is the contract, the approx form the deployment
    * knob. One group-keyed exchange; the sort within each group is
    * bounded by group size. */
  val qLengthQuantiles: Q = (s, dir) => {
    Tables.load(s, dir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D))")
          .as("qs"))
      .select(col("lang"), col("n_docs"),
        round(col("qs")(0), 4).as("p25"),
        round(col("qs")(1), 4).as("p50"),
        round(col("qs")(2), 4).as("p75"),
        round(col("qs")(3), 4).as("p90"))
      .orderBy("lang")
  }
  val qLengthQuantilesSql: String =
    """SELECT lang, n_docs,
      |  round(qs[1], 4) AS p25, round(qs[2], 4) AS p50,
      |  round(qs[3], 4) AS p75, round(qs[4], 4) AS p90
      |FROM (SELECT lang, COUNT(*) AS n_docs,
      |        quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9]) AS qs
      |      FROM documents GROUP BY lang)
      |ORDER BY lang""".stripMargin

  /** Deterministic hash-sampled quantiles — the honest SCALE path for
    * percentiles, kept oracle-exact: exact quantiles need a per-group
    * sort ([[qLengthQuantiles]]); sketches (t-digest/GK) are
    * merge-order-dependent and unverifiable cross-engine. The middle
    * road is a DETERMINISTIC uniform sample — rank rows by the
    * md5-prefix hash of their id and keep each group's bottom 64 — then
    * exact quantiles over the sample. Every engine picks the identical
    * sample (hash order is total, ids unique), so the estimates are
    * reproducible bit-for-bit while the sort shrinks from O(group) to
    * O(k). Sampling error replaces sketch error; k tunes it. */
  val qQuantileSample: Q = (s, dir) => {
    import graft.functions.HashExpressions.md5_hash64
    import org.apache.spark.sql.expressions.Window
    // sign-bit flip: Spark orders longs SIGNED, the oracle's UBIGINT
    // order is unsigned — xor with Long.MinValue maps one onto the other
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5_hash64(col("doc_id").cast("string"))
        .bitwiseXOR(lit(Long.MinValue)).asc,
        col("doc_id"))
    Tables.load(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 64)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        expr("percentile(n_chars, array(0.5D, 0.9D))").as("qs"))
      .select(col("lang"), col("n_sampled"),
        round(col("qs")(0), 4).as("p50_est"),
        round(col("qs")(1), 4).as("p90_est"))
      .orderBy("lang")
  }
  val qQuantileSampleSql: String =
    """WITH ranked AS (
      |  SELECT lang, n_chars, row_number() OVER (PARTITION BY lang
      |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT,
      |      doc_id) AS rn
      |  FROM documents)
      |SELECT lang, n_sampled,
      |  round(qs[1], 4) AS p50_est, round(qs[2], 4) AS p90_est
      |FROM (SELECT lang, COUNT(*) AS n_sampled,
      |        quantile_cont(n_chars, [0.5, 0.9]) AS qs
      |      FROM ranked WHERE rn <= 64 GROUP BY lang)
      |ORDER BY lang""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_quantile_sample", qQuantileSample, Some(qQuantileSampleSql)),
    ("q_vocab_oov", qVocabOov, Some(qVocabOovSql)),
    ("q_length_quantiles", qLengthQuantiles, Some(qLengthQuantilesSql)),
    ("q_lm_score", qLmScore, Some(qLmScoreSql)),
    ("q_quality_classifier", qQualityClassifier, Some(qQualityClassifierSql)),
    ("q_c4_clean", qC4Clean, Some(qC4CleanSql)),
    ("q_inverted_index", qInvertedIndex, Some(qInvertedIndexSql)),
    ("q_repetition", qRepetition, Some(qRepetitionSql)),
    ("q_pii_redact", qPiiRedact, Some(qPiiRedactSql)),
    ("q_filter_rules", qFilterRules, Some(qFilterRulesSql)),
    ("q_term_stats", qTermStats, Some(qTermStatsSql)),
    ("q_bm25", qBm25, Some(qBm25Sql)),
    ("q_diversity", qDiversity, Some(qDiversitySql)),
    ("q_doc_stats", qDocStats, Some(qDocStatsSql)),
    ("q_token_count", qTokenCount, Some(qTokenCountSql)),
    ("q_quality", qQuality, Some(qQualitySql)),
    ("q_lang_id", qLangId, Some(qLangIdSql)),
    ("q_fingerprint", qFingerprint, Some(qFingerprintSql)),
  )
}
