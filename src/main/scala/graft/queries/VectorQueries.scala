package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch

/** Similarity-search queries over the embeddings table. The brute-force
  * top-k (quantized cosine) has a full DuckDB oracle; the LSH variant is
  * approximate by design — its recall vs brute force is pinned by
  * SimilaritySpec, and the driver gets a rows-only check.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** exact top-10 neighbors for query vectors vec_id 0..4. */
  val qAnnTopk: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    SimilaritySearch.bruteForceTopK(
      em, em.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }
  val qAnnTopkSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, qv,
      |    CAST(list_sum(list_transform(qv, x -> x*x)) AS BIGINT) AS nsq
      |  FROM q),
      |scored AS (
      |  SELECT qs.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(CAST(list_sum(list_transform(list_zip(qs.qv, c.qv),
      |           p -> p[1]*p[2])) AS BIGINT) AS DOUBLE)
      |      / (sqrt(CAST(qs.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE))) AS cos
      |  FROM n qs JOIN n c ON qs.vec_id < 5 AND c.vec_id <> qs.vec_id)
      |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos FROM (
      |  SELECT *, row_number() OVER
      |    (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed ANN (12 hyperplanes, 1-bit multi-probe) — rows-only. */
  val qAnnLsh: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    SimilaritySearch.lshTopK(
      em, em.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-bucketed ANN (16 lists, 4 probes) — rows-only; recall pinned by
    * SimilaritySpec on planted clusters. */
  val qAnnIvf: Q = (s, dir) => {
    val em = Tables.load(s, dir, "embeddings")
    SimilaritySearch.ivfTopK(
      em, em.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  /** exact quantized norms — cheap full-table oracle over the list ops. */
  val qEmbedNorm: Q = (s, dir) => {
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorFunctions.normSqQ(
          VectorFunctions.quantize(col("embedding"))).as("norm_sq"))
      .orderBy(col("vec_id"))
  }
  val qEmbedNormSql: String =
    """SELECT vec_id, label,
      |  CAST(list_sum(list_transform(
      |    list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)),
      |    x -> x*x)) AS BIGINT) AS norm_sq
      |FROM embeddings ORDER BY vec_id""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_ann_topk", qAnnTopk, Some(qAnnTopkSql)),
    ("q_ann_lsh", qAnnLsh, None),
    ("q_ann_ivf", qAnnIvf, None),
    ("q_embed_norm", qEmbedNorm, Some(qEmbedNormSql)),
  )
}
