package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** Deterministic train/val/test splitting — identity-hash assignment, so
  * the oracle reproduces the exact per-row placement (randomSplit could
  * never be cross-engine-checked). */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** 90/5/5 split of documents by MD5(doc_id) bucket; per-split count +
    * id bounds + total characters pin the exact membership. */
  val qHashSplit: Q = (s, dir) => {
    Sampling.hashSplit(Tables.load(s, dir, "documents"), "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("split"))
  }
  val qHashSplitSql: String =
    """WITH b AS (
      |  SELECT doc_id, n_chars,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |      % 10000 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 9000 THEN 'train'
      |            WHEN bucket < 9500 THEN 'val'
      |            ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM b GROUP BY 1 ORDER BY split""".stripMargin

  /** Stratified sampling: per-language keep fractions (the training-mix
    * rebalancing step) — en 50%, de 20%, everything else 10%, selected
    * by identity hash so the oracle pins exact membership, not just
    * counts. */
  val qStratified: Q = (s, dir) => {
    Sampling.stratifiedSample(Tables.load(s, dir, "documents"),
      "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.2),
      defaultFraction = 0.1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))
  }
  val qStratifiedSql: String =
    """WITH b AS (
      |  SELECT doc_id, lang, n_chars,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |      % 10000 AS bucket
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM b
      |WHERE bucket < CASE WHEN lang = 'en' THEN 5000
      |                    WHEN lang = 'de' THEN 2000
      |                    ELSE 1000 END
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Benchmark decontamination: 8-gram overlap between the test split
    * and the train split — the standard n-gram collision check for
    * test-set contamination. Per test doc: distinct 8-grams and how
    * many also occur anywhere in train. At 100 TB no doc-pair product
    * ever forms: both sides reduce to DISTINCT gram sets and meet in
    * one equi-join on the gram (train side pre-deduped, so the join
    * cannot multiply rows). */
  val qDecontaminate: Q = (s, dir) => {
    import graft.functions.HashExpressions.word_shingles
    import graft.functions.TextFunctions.tokens
    val split = Sampling.hashSplit(Tables.load(s, dir, "documents"),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val grams = split.select(col("doc_id"), col("split"),
      explode(array_distinct(word_shingles(tokens(col("text")), 8)))
        .as("gram"))
    val trainGrams = grams.filter(col("split") === "train")
      .select(col("gram")).distinct()
    // barrier: the test side feeds BOTH the per-doc count and the
    // overlap join — unmaterialized, the shingle pipeline runs twice
    val testGrams = grams.filter(col("split") === "test")
      .select(col("doc_id"), col("gram")).localCheckpoint()
    val perDoc = testGrams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    val overlap = testGrams.join(trainGrams, "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    perDoc.join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .orderBy(col("doc_id"))
  }
  val qDecontaminateSql: String = {
    val toksSql = OracleSql.toks
    s"""WITH sp AS (
       |  SELECT doc_id, text,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      % 10000 AS bucket
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN bucket < 9000 THEN 'train'
       |         WHEN bucket < 9500 THEN 'val' ELSE 'test' END AS split,
       |    unnest(list_distinct(
       |      CASE WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
       |           ELSE list_transform(range(0, len(t) - 7),
       |                  i -> array_to_string(t[i+1:i+8], ' ')) END)) AS gram
       |  FROM (SELECT *, $toksSql AS t FROM sp)),
       |tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
       |te AS (SELECT doc_id, gram FROM g WHERE split = 'test'),
       |per AS (SELECT doc_id, COUNT(*) AS n_grams FROM te GROUP BY doc_id),
       |ov AS (SELECT te.doc_id, COUNT(*) AS n_overlap
       |       FROM te JOIN tr USING (gram) GROUP BY te.doc_id)
       |SELECT per.doc_id, per.n_grams,
       |  COALESCE(ov.n_overlap, 0) AS n_overlap
       |FROM per LEFT JOIN ov ON per.doc_id = ov.doc_id
       |ORDER BY per.doc_id""".stripMargin
  }

  /** Sequence packing (the tokenize→concatenate→chunk layout of GPT
    * pretraining): documents land in 4 deterministic hash shards, each
    * shard's token stream is cut into 2048-token packs, and the result
    * reports per-pack document counts and token sums. Integer cumsums —
    * engine-exact; no global sort (each shard packs independently). */
  val qPack: Q = (s, dir) => {
    import graft.functions.TextFunctions.tokenCount
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Packing
      .packAssignments(docs, "doc_id", "n_tokens", 2048L, 4)
      .groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("shard"), col("pack"))
  }
  val qPackSql: String = {
    val toksSql = OracleSql.toks
    s"""WITH d AS (
       |  SELECT doc_id, len($toksSql) AS n_tokens,
       |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      % 10000 % 4 AS BIGINT) AS shard
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, n_tokens, shard,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
       |      - n_tokens AS off
       |  FROM d)
       |SELECT shard, CAST(off // 2048 AS BIGINT) AS pack,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc
       |FROM o GROUP BY shard, pack ORDER BY shard, pack""".stripMargin
  }

  /** Flagship corpus-curation composite — the end-to-end LLM-data
    * pipeline in one query: language-ID gate + quality-score gate →
    * exact-dedup keep-min → deterministic train/val/test split → split
    * manifest. Every stage reuses an independently-oracled operator, and
    * the composite is oracled end to end (the DuckDB mirror rebuilds the
    * whole pipeline). */
  val qCuration: Q = (s, dir) => {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        langId(col("text")).as("pred_lang"),
        qualityScore(col("text")).as("score"),
        fingerprint_md5(col("text")).as("fp"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    val kept = scored.filter(col("pred_lang") === "en" && col("score") >= 0.5)
    val deduped = kept
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("__rn") === 1).drop("__rn")
    Sampling.hashSplit(deduped, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("split"))
  }
  val qCurationSql: String = {
    import graft.functions.TextFunctions.langMarkers
    val normSql = OracleSql.norm
    val toksSql = OracleSql.toks
    val stopsSql = graft.functions.TextFunctions.stopwords
      .map(s => s"'$s'").mkString("(", ",", ")")
    val markerCases = langMarkers.map { case (lang, ms) =>
      val arr = ms.map(m => s"'$m'").mkString("[", ",", "]")
      s"WHEN len(list_intersect($toksSql, $arr)) > 0 THEN '$lang'"
    }.mkString("\n      ")
    s"""WITH scored AS (
       |  SELECT doc_id, md5($normSql) AS fp, len($toksSql) AS n_tokens,
       |    CASE
       |      $markerCases
       |      WHEN regexp_matches($normSql, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |      ELSE 'en' END AS pred_lang,
       |    least(CAST(len($toksSql) AS DOUBLE) / 100.0, 1.0) * 0.5
       |      + (CAST(len(list_filter($toksSql, t -> t IN $stopsSql)) AS DOUBLE)
       |         / CAST(len($toksSql) AS DOUBLE)) * 0.3
       |      + (1.0 - CAST(len($normSql)
       |           - len(regexp_replace($normSql, '[^a-z0-9 ]', '', 'g'))
       |           AS DOUBLE) / len($normSql)) * 0.2 AS score
       |  FROM documents),
       |kept AS (
       |  SELECT * FROM scored WHERE pred_lang = 'en' AND score >= 0.5),
       |deduped AS (
       |  SELECT * FROM (SELECT *, row_number()
       |      OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept)
       |  WHERE rn = 1),
       |sp AS (
       |  SELECT *, CASE WHEN bucket < 9000 THEN 'train'
       |                 WHEN bucket < 9500 THEN 'val'
       |                 ELSE 'test' END AS split
       |  FROM (SELECT *,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
       |      % 10000 AS bucket FROM deduped))
       |SELECT split, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
       |FROM sp GROUP BY 1 ORDER BY split""".stripMargin
  }

  /** Weighted source mixing: rebalance the 20-source corpus to 4:2:2:1:1
    * over five kept sources (everything else dropped). The engine
    * computes per-source keep bounds from integer capacity arithmetic;
    * the oracle recomputes the same bounds in SQL from the same counts,
    * so the exact kept membership must match row for row. */
  val qSourceMix: Q = (s, dir) => {
    import graft.operators.Sampling
    Sampling.mixSources(Tables.load(s, dir, "documents"), "doc_id", "source",
      Seq("src0" -> 4L, "src1" -> 2L, "src2" -> 2L, "src3" -> 1L,
        "src4" -> 1L))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }
  val qSourceMixSql: String =
    """WITH w(source, wt) AS (
      |  VALUES ('src0', 4), ('src1', 2), ('src2', 2), ('src3', 1),
      |         ('src4', 1)),
      |cnt AS (
      |  SELECT source, COUNT(*) AS n FROM documents
      |  WHERE source IN (SELECT source FROM w) GROUP BY source),
      |cap AS (SELECT MIN(n * 10000 // wt) AS c FROM cnt JOIN w USING (source)),
      |b AS (
      |  SELECT source, (wt * (SELECT c FROM cap)) // n AS bound
      |  FROM cnt JOIN w USING (source))
      |SELECT d.doc_id, d.source
      |FROM documents d JOIN b USING (source)
      |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
      |  % 10000 < bound
      |ORDER BY d.doc_id""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_source_mix", qSourceMix, Some(qSourceMixSql)),
    ("q_hash_split", qHashSplit, Some(qHashSplitSql)),
    ("q_stratified", qStratified, Some(qStratifiedSql)),
    ("q_decontaminate", qDecontaminate, Some(qDecontaminateSql)),
    ("q_pack", qPack, Some(qPackSql)),
    ("q_curation", qCuration, Some(qCurationSql)),
  )
}
