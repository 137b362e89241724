package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  private def touch(dir: String, name: String, mtime: Long): Unit = {
    val p = Paths.get(dir, name)
    Files.write(p, "x\ty\n1\t2\n".getBytes("UTF-8"))
    p.toFile.setLastModified(mtime)
  }

  test("same-mtime late arrival is picked up on the next run (N2 boundary)") {
    val dir = tmpDir("ingest-boundary")
    val src = new IncrementalFileSource(spark, dir)
    val t0 = (System.currentTimeMillis() / 1000) * 1000 - 60000

    touch(dir, "a.tsv", t0)
    val (files1, wm1, seen1) = src.newFiles(0L)
    assert(files1.map(_.split('/').last) === Seq("a.tsv"))
    assert(wm1 === t0 && seen1 === Seq("a.tsv"))

    // b lands with the SAME mtime as the watermark, after the first listing
    touch(dir, "b.tsv", t0)
    val (files2, wm2, seen2) = src.newFiles(wm1, seen1)
    assert(files2.map(_.split('/').last) === Seq("b.tsv")) // not lost
    assert(wm2 === t0)
    assert(seen2.toSet === Set("a.tsv", "b.tsv"))

    // third run: nothing new
    val (files3, _, _) = src.newFiles(wm2, seen2)
    assert(files3.isEmpty)
  }

  test("checkpoint with file list round-trips") {
    val ck = new Checkpoint(spark, tmpDir("ingest-ck") + "/ck.json")
    ck.saveWithFiles("wm", 123L, "files", Seq("a.tsv", "b.tsv"))
    assert(ck.load("wm") === Some(123L))
    assert(ck.loadFiles("files").toSet === Set("a.tsv", "b.tsv"))
    // plain save still works and clears the list
    ck.save("wm", 456L)
    assert(ck.load("wm") === Some(456L))
    assert(ck.loadFiles("files") === Seq.empty)
  }
}
