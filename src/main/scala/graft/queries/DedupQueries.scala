package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Deduplication queries over documents/embeddings. Exact dedup and blocked
  * n-gram Jaccard have full DuckDB oracles; MinHash-LSH and SimHash use
  * engine-native hashing (xxhash64) no oracle can mirror, so they get
  * rows-only driver checks and are pinned by ScalaTest with planted
  * duplicates instead.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  private val normSql = OracleSql.norm
  private val toksSql = OracleSql.toks

  /** exact content dedup: one row per distinct normalized text. */
  val qDedupExact: Q = (s, dir) => {
    Dedup.exact(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("fingerprint"))
  }
  val qDedupExactSql: String =
    s"""SELECT md5($normSql) AS fingerprint, MIN(doc_id) AS keep_id,
       |  COUNT(*) AS dup_count
       |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin

  /** blocked exact 3-gram Jaccard near-dup pairs (lang + length-bucket
    * blocking), threshold 0.5 — fully oracle-checkable. */
  val qDedupJaccard: Q = (s, dir) => {
    Dedup.jaccardPairs(Tables.load(s, dir, "documents"), "doc_id", "text",
      langCol = "lang", lenCol = "n_chars", shingleK = 3, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupJaccardSql: String =
    s"""WITH prep AS (
       |  SELECT doc_id AS id, lang AS block_lang,
       |    n_chars // 100 AS block_len,
       |    CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |         ELSE list_transform(range(0, len(t) - 2),
       |                i -> array_to_string(t[i+1:i+3], ' ')) END AS sh
       |  FROM (SELECT *, $toksSql AS t FROM documents)),
       |pairs AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    list_distinct(a.sh) AS da, list_distinct(b.sh) AS db
       |  FROM prep a JOIN prep b
       |    ON a.block_lang = b.block_lang AND a.block_len = b.block_len
       |   AND a.id < b.id)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(da, db)) AS DOUBLE)
       |      / CAST(len(da) + len(db) - len(list_intersect(da, db)) AS DOUBLE)
       |      AS jaccard
       |  FROM pairs)
       |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** MinHash(64)+LSH(16 bands) candidate pairs verified at Jaccard ≥ 0.8 —
    * rows-only check (xxhash64-based); recall pinned by DedupSpec. */
  val qDedupMinhash: Q = (s, dir) => {
    Dedup.minhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SimHash near-dup pairs at Hamming ≤ 3 — rows-only; pinned by DedupSpec. */
  val qDedupSimhash: Q = (s, dir) => {
    Dedup.simhashPairs(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** embedding near-dup pairs by exact quantized cosine ≥ 0.25 on the
    * vec_id%10 canopy sample (embeddings are random ⇒ high thresholds are
    * vacuous; 0.25 exercises a non-trivial pair set). Full oracle. */
  val qDedupEmbedding: Q = (s, dir) => {
    Dedup.embeddingNearDups(
      Tables.load(s, dir, "embeddings").filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", threshold = 0.25)
      .orderBy(col("id_a"), col("id_b"))
  }
  val qDedupEmbeddingSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM embeddings WHERE vec_id % 10 = 0),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM q)
      |SELECT id_a, id_b, cos FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    CAST(CAST(list_sum(list_transform(list_zip(a.qv, b.qv),
      |           p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cos
      |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
      |WHERE cos >= 0.25 ORDER BY id_a, id_b""".stripMargin

  /** Embedding near-dup over the FULL corpus with hyperplane-LSH blocking
    * (no sample): candidate pairs only within an LSH bucket — the shape
    * that replaces the all-pairs product at scale. Rows-only (bucketing is
    * engine-native); the sampled exact variant above is the oracle anchor. */
  val qDedupEmbeddingLsh: Q = (s, dir) => {
    import graft.functions.VectorFunctions
    Dedup.embeddingNearDups(
      Tables.load(s, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.3,
      bucket = Some(VectorFunctions.hyperplaneBucket(col("embedding"), 8)))
      .orderBy(col("id_a"), col("id_b"))
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_dedup_embedding_lsh", qDedupEmbeddingLsh, None),
    ("q_dedup_exact", qDedupExact, Some(qDedupExactSql)),
    ("q_dedup_jaccard", qDedupJaccard, Some(qDedupJaccardSql)),
    ("q_dedup_minhash", qDedupMinhash, None),
    ("q_dedup_simhash", qDedupSimhash, None),
    ("q_dedup_embedding", qDedupEmbedding, Some(qDedupEmbeddingSql)),
  )
}
