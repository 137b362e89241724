package graft.iceberg

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.table.GraftTable

/** Iceberg v2 metadata export: the metadata tree round-trips through an
  * independent in-engine walk ([[IcebergExport.scan]]) AND through an
  * external engine — the DuckDB hand-walk reader
  * (tools/read_iceberg_duckdb.py), which decodes the Avro manifests with
  * its own object-container decoder and scans the data files with
  * DuckDB's parquet reader. That pair is the reference's multi-engine
  * readback contract (/root/reference/README.md:127-197) run for real:
  * same table bytes, two engines, identical answers. */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String, n: Long = 100L): GraftTable = {
    val t = GraftTable(spark, tmpDir(name) + "/t")
    t.append((1L to n).map(i => (i, s"v$i", i * 10L)).toDF("id", "v", "ts")
      .coalesce(2))
    t
  }

  test("export writes the v2 metadata tree and scan() reads it back") {
    val t = mkTable("ice-rt")
    val metaPath = IcebergExport.export(spark, t)
    assert(metaPath.endsWith("v1.metadata.json"))
    val metaDir = Paths.get(new java.net.URI(
      "file://" + t.location).getPath, "metadata")
    assert(Files.exists(metaDir.resolve("version-hint.text")))
    assert(Files.list(metaDir).toArray.map(_.toString)
      .count(_.endsWith(".avro")) === 2) // manifest list + manifest
    val back = IcebergExport.scan(spark, t.location)
    assert(back.orderBy("id").collect() ===
      t.read().orderBy("id").collect())
  }

  test("re-export after a commit bumps the version and sees new rows") {
    val t = mkTable("ice-v2", 10L)
    IcebergExport.export(spark, t)
    t.append(Seq((100L, "new", 1L)).toDF("id", "v", "ts"))
    val p2 = IcebergExport.export(spark, t)
    assert(p2.endsWith("v2.metadata.json"))
    assert(IcebergExport.scan(spark, t.location).count() === 11)
  }

  test("partitioned tables export (unpartitioned spec, same rows)") {
    val t = GraftTable(spark, tmpDir("ice-part") + "/t")
    t.append(Seq((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p1"))
      .toDF("id", "v", "part"), parts = Seq("part"))
    IcebergExport.export(spark, t)
    val back = IcebergExport.scan(spark, t.location)
    assert(back.orderBy("id").select("id", "v", "part")
      .as[(Long, String, String)].collect() ===
      Array((1L, "a", "p1"), (2L, "b", "p2"), (3L, "c", "p1")))
  }

  test("MOR tombstones refuse export until folded") {
    val t = mkTable("ice-mor", 20L)
    t.merge(Seq((5L, "upd", 999L)).toDF("id", "v", "ts"),
      Seq("id"), Seq("id"), "ts", mode = "mor")
    val e = intercept[IllegalArgumentException] {
      IcebergExport.export(spark, t)
    }
    assert(e.getMessage.contains("tombstones"))
    t.foldDeletes()
    IcebergExport.export(spark, t)
    val back = IcebergExport.scan(spark, t.location)
    assert(back.count() === 20)
    assert(back.filter($"id" === 5L).select("v").as[String].collect() ===
      Array("upd"))
  }

  test("external engine (DuckDB hand-walk) reads the export identically") {
    val t = mkTable("ice-duck", 500L)
    IcebergExport.export(spark, t)
    val loc = new java.net.URI("file://" + t.location).getPath
    // count + full-content checksum, computed by DuckDB over the files
    // the INDEPENDENT python Avro decoder resolved from the manifests
    val sql = "SELECT COUNT(*) AS n, SUM(id) AS s, SUM(ts) AS st, " +
      "COUNT(DISTINCT v) AS dv FROM t"
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", loc, sql).!!
    val Array(header, row) = out.trim.split("\n")
    assert(header === "n,s,st,dv")
    val expected = t.read().agg(count("*"), sum("id"), sum("ts"),
      countDistinct("v")).as[(Long, Long, Long, Long)].head()
    assert(row === s"${expected._1},${expected._2},${expected._3},${expected._4}")
  }
}
