package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (0L, Some("payload-aaaa")), (1L, Some("payload-bbbb")), (2L, None))
    .toDF("id", "s")
    .select($"id", $"s".cast("binary").as("payload"))

  test("decode produces typed metadata + features; nulls pass through") {
    val out = Multimodal.decodeAndFeaturize(media, "id", "payload", featureDim = 8)
    assert(out.schema.fieldNames.toSeq === Seq("id", "meta", "features"))
    val rows = out.orderBy("id").collect()
    assert(rows.length === 3)
    val meta0 = rows(0).getStruct(1)
    assert(meta0.getAs[String]("format").nonEmpty)
    assert(meta0.getAs[Int]("width") >= 64)
    assert(meta0.getAs[Long]("size_bytes") === 12L)
    assert(rows(0).getSeq[Float](2).length === 8)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2)) // null payload → null out
  }

  test("decode is deterministic batch-over-batch") {
    val a = Multimodal.decodeAndFeaturize(media, "id", "payload")
      .orderBy("id").collect()
    val b = Multimodal.decodeAndFeaturize(media, "id", "payload")
      .orderBy("id").collect()
    assert(a === b)
  }

  test("resize preserves aspect ratio cap; frame sampling strides") {
    val out = Multimodal.sampleFrames(
      Multimodal.resizeMeta(
        Multimodal.decodeAndFeaturize(media, "id", "payload"), maxSide = 128),
      stride = 2).filter($"meta".isNotNull).collect()
    out.foreach { r =>
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      val resized = r.getAs[org.apache.spark.sql.Row]("resized")
      assert(resized.getAs[Int]("width") <= 128)
      val frames = r.getSeq[Int](r.fieldIndex("frame_indices"))
      assert(frames.head === 0)
      assert(frames.forall(_ < meta.getAs[Int]("n_frames")))
      if (frames.length > 1) assert(frames(1) - frames(0) === 2)
    }
  }

  test("plumbing survives a real repartitioned distributed run") {
    val big = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id".as("id"), $"text".cast("binary").as("payload"))
      .repartition(8)
    val out = Multimodal.decodeAndFeaturize(big, "id", "payload")
    assert(out.count() === 500)
    assert(out.filter($"meta".isNull).count() === 0)
  }
}
