package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{MediaCodec, Multimodal}

/** Multimodal-column queries: binary payload plumbing through the
  * per-partition batch decode/featurize path.
  *
  * Oracle strategy: payloads are synthesized as HEADER-VALID JPEG/PNG/WAV
  * containers whose dimensions/rates are a deterministic function of
  * doc_id ([[MediaCodec.syntheticForDoc]]); [[MediaCodec.decode]] then
  * REALLY parses them back out of the bytes (SOF / IHDR / fmt-chunk
  * walking, no fakery). The DuckDB oracle mirrors only the generating
  * arithmetic — so a hash match proves the byte-level encode→parse round
  * trip, end to end, for every doc.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** synthesize media per doc → decode to typed metadata + features →
    * resize + frame-sample. */
  val qMultimodalDecode: Q = (s, dir) => {
    import s.implicits._
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, MediaCodec.syntheticForDoc(id))))
      .toDF("id", "payload")
    val decoded = Multimodal.decodeAndFeaturize(media, "id", "payload")
    // nullable meta fields are emitted as -1 sentinels: the oracle compare
    // sorts rows by value, which a NULL/NaN mix breaks cross-engine
    Multimodal.sampleFrames(Multimodal.resizeMeta(decoded, maxSide = 512), stride = 5)
      .select(col("id").as("doc_id"),
        col("meta.format").as("format"),
        coalesce(col("meta.width"), lit(-1)).as("width"),
        coalesce(col("meta.height"), lit(-1)).as("height"),
        col("meta.n_frames").as("n_frames"),
        coalesce(col("meta.sample_rate"), lit(-1)).as("sample_rate"),
        coalesce(col("meta.channels"), lit(-1)).as("channels"),
        col("meta.size_bytes").as("size_bytes"),
        coalesce(col("resized.width"), lit(-1)).as("resized_w"),
        coalesce(col("resized.height"), lit(-1)).as("resized_h"),
        size(col("frame_indices")).as("n_sampled_frames"),
        size(col("features")).as("feature_dim"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB mirror of the GENERATING arithmetic only (the engine side
    * must recover these values from the container bytes). The resize
    * scale mirrors the identical IEEE double expression. */
  private val oracleMultimodalDecode: String =
    """WITH m AS (
      |  SELECT doc_id, doc_id % 3 AS k,
      |    64 + (doc_id * 7) % 1024 AS w,
      |    64 + (doc_id * 13) % 1024 AS h,
      |    doc_id % 50 AS pad,
      |    8000 + (doc_id % 8) * 1000 AS rate,
      |    1 + doc_id % 2 AS ch,
      |    100 + doc_id % 400 AS ns
      |  FROM documents)
      |SELECT doc_id,
      |  CASE k WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END AS format,
      |  CAST(CASE WHEN k < 2 THEN w ELSE -1 END AS INTEGER) AS width,
      |  CAST(CASE WHEN k < 2 THEN h ELSE -1 END AS INTEGER) AS height,
      |  CAST(CASE WHEN k < 2 THEN 1 ELSE ns END AS INTEGER) AS n_frames,
      |  CAST(CASE WHEN k = 2 THEN rate ELSE -1 END AS INTEGER) AS sample_rate,
      |  CAST(CASE WHEN k = 2 THEN ch ELSE -1 END AS INTEGER) AS channels,
      |  CAST(CASE k WHEN 0 THEN 27 + pad WHEN 1 THEN 57 + pad
      |       ELSE 44 + ns * ch * 2 END AS BIGINT) AS size_bytes,
      |  CAST(CASE WHEN k < 2 THEN
      |    FLOOR(w * LEAST(512.0 / GREATEST(w, h), 1.0)) ELSE -1
      |  END AS INTEGER) AS resized_w,
      |  CAST(CASE WHEN k < 2 THEN
      |    FLOOR(h * LEAST(512.0 / GREATEST(w, h), 1.0)) ELSE -1
      |  END AS INTEGER) AS resized_h,
      |  CAST(CASE WHEN k < 2 THEN 1 ELSE (ns - 1) // 5 + 1 END AS INTEGER)
      |    AS n_sampled_frames,
      |  CAST(16 AS INTEGER) AS feature_dim
      |FROM m ORDER BY doc_id""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_multimodal_decode", qMultimodalDecode, Some(oracleMultimodalDecode)),
  )
}
