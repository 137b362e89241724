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
  * Metadata decode is REAL: [[MediaCodec]] parses JPEG SOF / PNG IHDR /
  * GIF screen-descriptor / WAV fmt+data headers straight from the payload
  * bytes (pure JVM, no codec dependency). Unrecognized or corrupt payloads
  * decode as format "unknown" with null metadata — never an exception.
  *
  * FEATURE extraction is real too: pixels decode through the JDK's
  * ImageIO ([[MediaCodec.decodePixels]]) and WAV PCM through
  * [[MediaCodec.decodeSamples]]; [[realFeatures]] derives a fixed-dim
  * vector (color histogram + aspect + mean luma for rasters; RMS /
  * crossing-rate / peak for audio). A payload with no decodable
  * raster/samples (header-only fixtures, corrupt scan data) yields NULL
  * features — honest "undecodable", not a fake vector. Swapping in a
  * learned embedding model changes only this function body, nothing in
  * the plan shape.
  */
object Multimodal {

  /** media metadata struct produced by decode. Image fields are null for
    * audio and vice versa; all null (but size_bytes) for "unknown". */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("size_bytes", LongType)))

  /** Real content features from decoded pixels/samples, fixed `dim`
    * (padded with zeros; dim ≥ 16 carries the full set):
    *   - raster media: 12 normalized RGB histogram bins, aspect ratio,
    *     mean block luma / 255, flag 1.0;
    *   - audio media: RMS/32768, crossings-per-frame, peak/32768,
    *     log10(frames), flag 2.0;
    *   - no decodable content: None (the column goes NULL).
    * Deterministic: integer pixel/sample arithmetic feeds each float
    * exactly once — no accumulation-order variance. */
  def realFeatures(payload: Array[Byte], dim: Int): Option[Array[Float]] = {
    val out = new Array[Float](dim)
    MediaCodec.decodePixels(payload) match {
      case Some(img) =>
        val hist = MediaCodec.rgbHistogram(img, bins = 4)
        val total = img.argb.length.toFloat
        var i = 0
        while (i < 12 && i < dim) { out(i) = hist(i) / total; i += 1 }
        if (dim > 12) out(12) = img.width.toFloat / img.height
        if (dim > 13) {
          var sum = 0L
          img.argb.foreach(v => sum += MediaCodec.luma(v))
          out(13) = (sum / img.argb.length).toFloat / 255f
        }
        if (dim > 14) out(14) = 1.0f
        Some(out)
      case None =>
        MediaCodec.decodeSamples(payload) match {
          case Some(a) if a.samples.nonEmpty =>
            val (peak, crossings, energy) = MediaCodec.audioFeatures(a)
            val n = a.samples.length / a.channels
            out(0) = math.sqrt(energy.toDouble / n).toFloat / 32768f
            if (dim > 1) out(1) = crossings.toFloat / n
            if (dim > 2) out(2) = peak.toFloat / 32768f
            if (dim > 3) out(3) = math.log10(n.toDouble).toFloat
            if (dim > 4) out(4) = 2.0f
            Some(out)
          case _ => None
        }
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
          val m = MediaCodec.decode(payload)
          def box(o: Option[Int]): Any = o.map(Int.box).orNull
          Row(id,
            Row(m.format, box(m.width), box(m.height), box(m.nFrames),
              box(m.sampleRate), box(m.channels), m.sizeBytes),
            realFeatures(payload, featureDim).map(_.toSeq).orNull)
        }
      }
    }
  }

  /** "Resize": metadata-level op — recompute target dims so the LARGER
    * side fits maxSide, preserving aspect ratio; no-op if already within
    * bounds. Null meta (tombstones) and non-image media (null dims: audio,
    * unknown) pass through as null — Spark's least()/greatest() skip
    * nulls, so the null cases must be explicit or a tombstone would come
    * out claiming maxSide-px dimensions. (The real pixel op needs a full
    * decoder; the plan-level contract — a map over the meta struct, no
    * shuffle — is what's real.) */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame = {
    val longSide = greatest(col("meta.width"), col("meta.height"))
    val scale = least(lit(maxSide.toDouble) / longSide, lit(1.0))
    decoded.withColumn("resized",
      when(col("meta").isNull || col("meta.width").isNull, lit(null))
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
