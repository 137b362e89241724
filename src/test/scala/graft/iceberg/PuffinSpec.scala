package graft.iceberg

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** The from-spec puffin / deletion-vector-v1 / roaring codec
  * ([[Puffin]]): round trips across every container kind, plus decode
  * of the run-container format our writer never emits (foreign writers
  * do). */
class PuffinSpec extends AnyFunSuite {

  test("portable-64 roaring round trip: array, bitmap and multi-high-key " +
      "containers") {
    val rnd = new scala.util.Random(7)
    // array containers (sparse), one dense container (> 4096 values in
    // one 16-bit chunk → bitmap encoding), and positions above 2^32
    // (second high-32 bucket)
    val sparse = Seq.fill(300)(rnd.nextInt(1 << 20).toLong)
    val dense = (0 until 5000).map(i => (7L << 16) + i * 3 % 65536)
      .map(_.toLong)
    val high = Seq(1L << 32, (1L << 32) + 5, (5L << 32) + 123456789L)
    val all = (sparse ++ dense ++ high).distinct
    val bytes = Puffin.serializePortable64(all)
    assert(Puffin.deserializePortable64(bytes).toSeq ===
      all.sorted)
  }

  test("empty and singleton vectors round trip") {
    assert(Puffin.deserializePortable64(
      Puffin.serializePortable64(Seq.empty)).isEmpty)
    assert(Puffin.deserializePortable64(
      Puffin.serializePortable64(Seq(42L))).toSeq === Seq(42L))
  }

  test("run-container decode (cookie 12347): a foreign writer's " +
      "run-encoded bitmap reads back exactly") {
    // hand-craft: one 32-bit map, high key 0, ONE run container with
    // 2 runs [10..14] and [100..100]; runs cookie packs (size-1)<<16
    val runs = Seq((10, 4), (100, 0))
    val values = runs.flatMap { case (s, l) => (s to s + l) }
    val body = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
    body.putInt(12347 | (0 << 16)) // size 1 → (size-1)=0 in upper bits
    body.put(1.toByte) // run flag bitset: container 0 is a run
    body.putShort(0) // key
    body.putShort((values.size - 1).toShort) // cardinality-1
    // size(1) < NO_OFFSET_THRESHOLD(4) → no offset header
    body.putShort(runs.size.toShort)
    runs.foreach { case (s, l) =>
      body.putShort(s.toShort); body.putShort(l.toShort) }
    val map32 = java.util.Arrays.copyOf(body.array(), body.position())
    val out = ByteBuffer.allocate(12 + map32.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(1L).putInt(0).put(map32)
    assert(Puffin.deserializePortable64(out.array()).toSeq ===
      values.map(_.toLong))
  }

  test("DV blob framing: round trip, magic validation, short-blob " +
      "refusal") {
    val ps = Seq(0L, 3L, 65536L, (1L << 33) + 7)
    val blob = Puffin.dvBlob(ps)
    assert(Puffin.decodeDvBlob(blob).toSeq === ps.sorted)
    val garbled = blob.clone(); garbled(5) = 0x00
    val e = intercept[IllegalArgumentException](
      Puffin.decodeDvBlob(garbled))
    assert(e.getMessage.contains("magic"))
    intercept[IllegalArgumentException](
      Puffin.decodeDvBlob(Array[Byte](1, 2, 3)))
  }

  test("puffin file: blobs are readable at their returned coordinates; " +
      "header and footer magic frame the file") {
    val dir = java.nio.file.Files.createTempDirectory("puffin").toString
    val path = new org.apache.hadoop.fs.Path(s"$dir/dv.puffin")
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val coords = Puffin.writeDvFile(fs, path, Seq(
      ("file:///data/a.parquet", Seq(1L, 2L, 10L)),
      ("file:///data/b.parquet", Seq(0L, 999999L))), 100L, 5L)
    assert(coords.map(_._1) === Seq("file:///data/a.parquet",
      "file:///data/b.parquet"))
    assert(coords.map(_._4) === Seq(3L, 2L))
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(Puffin.readDv(conf, path.toString, coords(0)._2,
      coords(0)._3).toSeq === Seq(1L, 2L, 10L))
    assert(Puffin.readDv(conf, path.toString, coords(1)._2,
      coords(1)._3).toSeq === Seq(0L, 999999L))
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/dv.puffin"))
    assert(bytes.take(4).toSeq === "PFA1".getBytes.toSeq)
    assert(bytes.takeRight(4).toSeq === "PFA1".getBytes.toSeq)
  }

  test("footer JSON escapes interpolated URIs: a data-file path with " +
      "quotes/backslashes still parses for native readers") {
    val dir = java.nio.file.Files.createTempDirectory("puffinesc").toString
    val path = new org.apache.hadoop.fs.Path(s"$dir/dv.puffin")
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val nasty = """file:///da"ta/we\ird.parquet"""
    Puffin.writeDvFile(fs, path, Seq((nasty, Seq(3L))), 1L, 1L)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/dv.puffin"))
    // slice the footer payload per the spec's framing: trailing magic,
    // 8-byte tail (length + flags) before it
    val tail = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fLen = tail.getInt
    val footer = new String(bytes, bytes.length - 12 - fLen, fLen,
      java.nio.charset.StandardCharsets.UTF_8)
    val parsed = org.json4s.jackson.JsonMethods.parse(footer)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val got = (parsed \ "blobs").children.head \ "properties" \
      "referenced-data-file"
    assert(got.extract[String] === nasty)
  }
}
