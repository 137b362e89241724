package graft.iceberg

import scala.sys.process._

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

/** Iceberg WRITE-BACK — committing graft appends INTO a foreign v2 tree
  * ([[IcebergWriteBack.appendTo]]): the write direction of the
  * multi-engine loop. Evidence runs three independent readers over the
  * committed tree: graft's own importer, the incremental follow, and the
  * external DuckDB hand-walk reader (tools/read_iceberg_duckdb.py). */
class IcebergWriteBackSpec extends SparkSpec {
  import spark.implicits._

  test("unpartitioned round trip: append commits a new snapshot every " +
      "reader sees; chained appends version-chain; the follow is " +
      "metadata-only over the write-back") {
    val t = GraftTable(spark, tmpDir("wb-rt") + "/t")
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 2)
    val tip = IcebergImport.currentSnapshotId(spark, t.location).get

    val s1 = IcebergWriteBack.appendTo(spark, t.location,
      (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"))
    // importer sees old ∪ new
    assert(IcebergImport.read(spark, t.location).select("id").as[Long]
      .collect().sorted === (1L to 15L).toArray)
    // the incremental follow delivers exactly the appended slice
    assert(IcebergImport.readChanges(spark, t.location, tip)
      .select("id").as[Long].collect().sorted === (11L to 15L).toArray)
    // snapshots view: new tip, append op, correct parent
    val snap = IcebergImport.snapshots(spark, t.location)
      .orderBy(col("sequence_number").desc).limit(1)
      .select("snapshot_id", "parent_id", "operation")
      .as[(Long, Option[Long], String)].collect()(0)
    assert(snap === ((s1, Some(tip), "append")))
    // the tree's resolution convention is preserved: graft tables stamp
    // parquet field ids, so the export tree is id-ful and the appended
    // files must be too (no mixed-mode flip)
    val newFiles = IcebergImport.plan(spark, t.location).files
      .filter(_.uri.contains("graft-append-"))
    assert(newFiles.nonEmpty &&
      newFiles.forall(f => IcebergImport.footerInfo(spark, f.uri).hasIds))
    // external engine: DuckDB hand-walks the committed tree
    val path = new java.net.URI("file://" + t.location).getPath
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.trim.split("\n").last === "15")
    // chained append: the next commit builds on the write-back's version
    IcebergWriteBack.appendTo(spark, t.location,
      (16L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(IcebergImport.read(spark, t.location).count() === 20)
    val out2 = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out2.trim.split("\n").last === "20")
  }

  test("identity-partitioned tree: written files land under partition " +
      "dirs with manifest tuples, and partition pruning covers them") {
    val t = GraftTable(spark, tmpDir("wb-part") + "/t")
    t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "x"),
      parts = Seq("cat"))
    IcebergExport.export(spark, t)
    // rows into an existing partition AND a brand-new one
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((3L, "a", 3.0), (4L, "c", 4.0)).toDF("id", "cat", "x"))
    val all = IcebergImport.read(spark, t.location)
    assert(all.orderBy("id").select("id", "cat").as[(Long, String)]
      .collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")))
    // manifest-level pruning selects the new partition's file only
    val pruned = IcebergImport.readPartition(spark, t.location,
      Map("cat" -> "c"))
    assert(pruned.select("id").as[Long].collect().toSeq === Seq(4L))
    assert(pruned.inputFiles.length === 1)
    // and the mixed old/new partition reads both commits' files
    assert(IcebergImport.readPartition(spark, t.location,
      Map("cat" -> "a")).select("id").as[Long].collect().sorted ===
      Array(1L, 3L))
  }

  test("refusals: hidden-transform spec and schema mismatch fail loud, " +
      "committing nothing") {
    val t = GraftTable(spark, tmpDir("wb-days") + "/t")
    t.append(Seq((1L, java.sql.Date.valueOf("2024-01-02")))
      .toDF("id", "d"), parts = Seq("days(d)"))
    IcebergExport.export(spark, t)
    val before = IcebergImport.currentSnapshotId(spark, t.location)
    val e = intercept[IllegalArgumentException](
      IcebergWriteBack.appendTo(spark, t.location,
        Seq((2L, java.sql.Date.valueOf("2024-01-03"))).toDF("id", "d")))
    assert(e.getMessage.contains("identity"))

    val u = GraftTable(spark, tmpDir("wb-mismatch") + "/t")
    u.append(Seq((1L, "a")).toDF("id", "v"))
    IcebergExport.export(spark, u)
    val e2 = intercept[IllegalArgumentException](
      IcebergWriteBack.appendTo(spark, u.location,
        Seq((2L, "b", 9)).toDF("id", "v", "extra")))
    assert(e2.getMessage.contains("extra"))
    // nothing committed anywhere
    assert(IcebergImport.currentSnapshotId(spark, t.location) === before)
    assert(IcebergImport.read(spark, u.location).count() === 1)
  }

  test("SQL surface: CALL graft.append_iceberg commits a view into the " +
      "foreign tree") {
    val t = GraftTable(spark, tmpDir("wb-call") + "/t")
    t.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t)
    (6L to 9L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("wb_call_src")
    val res = spark.sql(s"CALL graft.append_iceberg('${t.location}', " +
      "source => 'wb_call_src')").collect()
    assert(res.length === 1 && res(0).getLong(0) > 0L)
    assert(IcebergImport.read(spark, t.location).select("id").as[Long]
      .collect().sorted === (1L to 9L).toArray)
    spark.catalog.dropTempView("wb_call_src")
  }
}
