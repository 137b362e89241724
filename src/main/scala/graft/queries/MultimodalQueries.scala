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
        // header-only image fixtures have no decodable raster → NULL
        // features (honest undecodable); the PCM WAVs featurize for real
        coalesce(size(col("features")), lit(-1)).as("feature_dim"))
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
      |  CAST(CASE WHEN k = 2 THEN 16 ELSE -1 END AS INTEGER) AS feature_dim
      |FROM m ORDER BY doc_id""".stripMargin

  /** One decoded-feature row per doc — REAL pixel/sample decode, integer-
    * exact features. Even ids carry a fully valid two-tone PNG (real zlib
    * + CRCs) decoded through the JDK's ImageIO; odd ids a ±amp square-
    * wave WAV decoded to PCM. Features: 4-bin-per-channel RGB histogram
    * counts and the 8×8 average-hash hex for rasters; peak / sign-flip
    * count / channel-0 energy for audio. The DuckDB oracle mirrors ONLY
    * the generating arithmetic (colors, dims, wave shape) — a hash match
    * proves encode → real decode → feature math, end to end. */
  case class FeatRow(doc_id: Long, format: String, px_w: Int, px_h: Int,
      phash: String,
      h_r0: Long, h_r1: Long, h_r2: Long, h_r3: Long,
      h_g0: Long, h_g1: Long, h_g2: Long, h_g3: Long,
      h_b0: Long, h_b1: Long, h_b2: Long, h_b3: Long,
      peak: Long, crossings: Long, energy: Long)

  val qMultimodalFeatures: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val payload = MediaCodec.syntheticFeatureDoc(id)
        MediaCodec.decodePixels(payload) match {
          case Some(img) =>
            val h = MediaCodec.rgbHistogram(img, bins = 4)
            FeatRow(id, "png", img.width, img.height,
              MediaCodec.averageHashHex(img),
              h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7),
              h(8), h(9), h(10), h(11), -1L, -1L, -1L)
          case None =>
            val a = MediaCodec.decodeSamples(payload).get
            val (peak, crossings, energy) = MediaCodec.audioFeatures(a)
            FeatRow(id, "wav", -1, -1, "-",
              -1L, -1L, -1L, -1L, -1L, -1L, -1L, -1L,
              -1L, -1L, -1L, -1L, peak, crossings, energy)
        }
      }).toDF().orderBy(col("doc_id"))
  }

  private val oracleMultimodalFeatures: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    8 * (8 + (doc_id * 7) % 57) AS w,
      |    8 * (8 + (doc_id * 13) % 57) AS h,
      |    (doc_id * 17) % 256 AS ra, (doc_id * 29) % 256 AS ga,
      |    (doc_id * 31) % 256 AS ba,
      |    (doc_id * 37) % 256 AS rb, (doc_id * 41) % 256 AS gb,
      |    (doc_id * 43) % 256 AS bb,
      |    500 + doc_id % 3000 AS amp,
      |    1 + doc_id % 20 AS hp,
      |    200 + doc_id % 300 AS ns
      |  FROM documents),
      |p AS (
      |  SELECT *, (w // 2) * h AS half,
      |    (299 * ra + 587 * ga + 114 * ba) // 1000 AS la,
      |    (299 * rb + 587 * gb + 114 * bb) // 1000 AS lb
      |  FROM m),
      |q AS (SELECT *, (32 * la + 32 * lb) // 64 AS lmean FROM p)
      |SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN w ELSE -1 END AS INTEGER) AS px_w,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN h ELSE -1 END AS INTEGER) AS px_h,
      |  CASE WHEN doc_id % 2 = 1 THEN '-'
      |       ELSE repeat(CASE WHEN la > lmean AND lb > lmean THEN 'ff'
      |                        WHEN la > lmean THEN '0f'
      |                        WHEN lb > lmean THEN 'f0'
      |                        ELSE '00' END, 8) END AS phash,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ra // 64 = 0 THEN half ELSE 0 END) +
      |    (CASE WHEN rb // 64 = 0 THEN half ELSE 0 END) END AS BIGINT) AS h_r0,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ra // 64 = 1 THEN half ELSE 0 END) +
      |    (CASE WHEN rb // 64 = 1 THEN half ELSE 0 END) END AS BIGINT) AS h_r1,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ra // 64 = 2 THEN half ELSE 0 END) +
      |    (CASE WHEN rb // 64 = 2 THEN half ELSE 0 END) END AS BIGINT) AS h_r2,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ra // 64 = 3 THEN half ELSE 0 END) +
      |    (CASE WHEN rb // 64 = 3 THEN half ELSE 0 END) END AS BIGINT) AS h_r3,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ga // 64 = 0 THEN half ELSE 0 END) +
      |    (CASE WHEN gb // 64 = 0 THEN half ELSE 0 END) END AS BIGINT) AS h_g0,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ga // 64 = 1 THEN half ELSE 0 END) +
      |    (CASE WHEN gb // 64 = 1 THEN half ELSE 0 END) END AS BIGINT) AS h_g1,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ga // 64 = 2 THEN half ELSE 0 END) +
      |    (CASE WHEN gb // 64 = 2 THEN half ELSE 0 END) END AS BIGINT) AS h_g2,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ga // 64 = 3 THEN half ELSE 0 END) +
      |    (CASE WHEN gb // 64 = 3 THEN half ELSE 0 END) END AS BIGINT) AS h_g3,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ba // 64 = 0 THEN half ELSE 0 END) +
      |    (CASE WHEN bb // 64 = 0 THEN half ELSE 0 END) END AS BIGINT) AS h_b0,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ba // 64 = 1 THEN half ELSE 0 END) +
      |    (CASE WHEN bb // 64 = 1 THEN half ELSE 0 END) END AS BIGINT) AS h_b1,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ba // 64 = 2 THEN half ELSE 0 END) +
      |    (CASE WHEN bb // 64 = 2 THEN half ELSE 0 END) END AS BIGINT) AS h_b2,
      |  CAST(CASE WHEN doc_id % 2 = 1 THEN -1 ELSE
      |    (CASE WHEN ba // 64 = 3 THEN half ELSE 0 END) +
      |    (CASE WHEN bb // 64 = 3 THEN half ELSE 0 END) END AS BIGINT) AS h_b3,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN -1 ELSE amp END AS BIGINT) AS peak,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN -1
      |       ELSE (ns - 1) // hp END AS BIGINT) AS crossings,
      |  CAST(CASE WHEN doc_id % 2 = 0 THEN -1
      |       ELSE ns * amp * amp END AS BIGINT) AS energy
      |FROM q ORDER BY doc_id""".stripMargin

  val all: Seq[(String, Q, Option[String])] = Seq(
    ("q_multimodal_decode", qMultimodalDecode, Some(oracleMultimodalDecode)),
    ("q_multimodal_features", qMultimodalFeatures, Some(oracleMultimodalFeatures)),
  )
}
