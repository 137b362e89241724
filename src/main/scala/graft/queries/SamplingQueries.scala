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

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_hash_split", qHashSplit, Some(qHashSplitSql)),
  )
}
