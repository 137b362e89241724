package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload plumbing through the
  * per-partition batch decode/featurize path. The decode itself is a
  * deterministic stub (no media libs in this container — see Multimodal),
  * so these get rows-only driver checks; the batch shape, schema, and
  * determinism are pinned by MultimodalSpec.
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** documents' text bytes stood up as a binary media column, decoded to
    * typed metadata + features, resized + frame-sampled. */
  val qMultimodalDecode: Q = (s, dir) => {
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
    val decoded = Multimodal.decodeAndFeaturize(media, "id", "payload")
    Multimodal.sampleFrames(Multimodal.resizeMeta(decoded, maxSide = 512), stride = 5)
      .select(col("id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("resized.width").as("resized_w"), col("resized.height").as("resized_h"),
        size(col("frame_indices")).as("n_sampled_frames"),
        size(col("features")).as("feature_dim"))
      .orderBy(col("id"))
  }

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_multimodal_decode", qMultimodalDecode, None),
  )
}
