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

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_term_stats", qTermStats, Some(qTermStatsSql)),
    ("q_doc_stats", qDocStats, Some(qDocStatsSql)),
    ("q_token_count", qTokenCount, Some(qTokenCountSql)),
    ("q_quality", qQuality, Some(qQualitySql)),
    ("q_lang_id", qLangId, Some(qLangIdSql)),
    ("q_fingerprint", qFingerprint, Some(qFingerprintSql)),
  )
}
