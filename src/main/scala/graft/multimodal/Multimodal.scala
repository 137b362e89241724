package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) carried as opaque
  * `binary` columns with a typed metadata struct, processed by batch
  * functions over `mapPartitions` — the Scala analogue of `mapInPandas`
  * batch UDFs: one JVM-side function invocation per *partition*, iterating
  * rows, so per-row overhead is amortized and any native decoder handle can
  * be opened once per partition (exactly how a real image codec would be
  * held).
  *
  * The Spark-side contract — schema, partitioning, batch shape, null
  * passthrough — is real and tested. The codec itself is a STUB (this
  * container has no image/audio libraries): `decodeStub` derives
  * deterministic pseudo-metadata and features from the payload bytes, and
  * is clearly marked below. Swapping in a real decoder changes only the
  * function body, nothing in the plan.
  */
object Multimodal {

  /** media metadata struct produced by "decode". */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("size_bytes", LongType)))

  /** ======== STUB ========
    * Deterministic fake decode: metadata and a fixed-length feature vector
    * derived purely from the payload bytes (FNV-64 mixing), so tests are
    * reproducible. A real implementation would call an image/audio codec
    * here — per-partition, not per-row. */
  def decodeStub(payload: Array[Byte]): (String, Int, Int, Int, Long) = {
    val h = graft.functions.HashExpressions.RollingHash64.hash(payload)
    val fmt = Seq("jpeg", "png", "webp")(math.floorMod(h, 3).toInt)
    val width = 64 + math.floorMod(h >> 8, 1024).toInt
    val height = 64 + math.floorMod(h >> 20, 1024).toInt
    val frames = 1 + math.floorMod(h >> 32, 30).toInt
    (fmt, width, height, frames, payload.length.toLong)
  }

  /** ======== STUB ========
    * Deterministic fake feature extraction: `dim` floats mixed from the
    * payload — stands in for an embedding model forward pass. */
  def featuresStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val base = graft.functions.HashExpressions.RollingHash64.hash(payload)
    Array.tabulate(dim) { i =>
      val m = base * (2 * i + 1) + 0x9e3779b97f4a7c15L
      // map to [-1, 1) deterministically
      (m >> 11).toFloat / (1L << 52).toFloat
    }
  }

  /** Decode a binary media column into a metadata struct + feature vector,
    * batch-wise per partition. Input: (idCol: long, payloadCol: binary).
    * Output: id, meta struct, features array<float>. Null payloads pass
    * through with null meta/features (at-least-once pipelines carry
    * tombstones). */
  def decodeAndFeaturize(df: DataFrame, idCol: String, payloadCol: String,
      featureDim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", mediaMetaSchema),
      StructField("features", ArrayType(FloatType))))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition setup happens HERE (codec open, model load) — once,
      // not per row; this is the batch shape that matters at scale.
      rows.map { r =>
        val id = r.getLong(idIdx)
        if (r.isNullAt(payloadIdx)) Row(id, null, null)
        else {
          val payload = r.getAs[Array[Byte]](payloadIdx)
          val (fmt, w, h, nf, sz) = decodeStub(payload)
          Row(id, Row(fmt, w, h, nf, sz),
            featuresStub(payload, featureDim).toSeq)
        }
      }
    }
  }

  /** "Resize": metadata-level op — recompute target dims so the LARGER
    * side fits maxSide, preserving aspect ratio; no-op if already within
    * bounds. Null meta (tombstones) passes through as null — Spark's
    * least()/greatest() skip nulls, so the null case must be explicit or a
    * tombstone would come out claiming maxSide-px dimensions. (The real
    * pixel op is the stubbed codec's job; the plan-level contract — a map
    * over the meta struct, no shuffle — is what's real.) */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val longSide = greatest(col("meta.width"), col("meta.height"))
    val scale = least(lit(maxSide.toDouble) / longSide, lit(1.0))
    decoded.withColumn("resized",
      when(col("meta").isNull, lit(null))
        .otherwise(struct(
          col("meta.format").as("format"),
          floor(col("meta.width") * scale).cast("int").as("width"),
          floor(col("meta.height") * scale).cast("int").as("height"))))
  }

  /** Frame sampling for video-like media: every `stride`-th frame index up
    * to n_frames — an array column, exploded downstream as needed. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.withColumn("frame_indices",
      when(col("meta.n_frames").isNull, lit(null))
        .otherwise(sequence(lit(0), col("meta.n_frames") - 1, lit(stride))))
}
