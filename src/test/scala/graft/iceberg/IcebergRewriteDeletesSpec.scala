package graft.iceberg

import scala.sys.process._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.GraftTable

/** `rewrite_position_deletes` on foreign trees
  * ([[IcebergWriteBack.rewritePositionDeletes]]) — Iceberg's
  * `rewrite_position_delete_files` maintenance action: a CDC-heavy tree
  * adds one small position-delete file per commit, and every read then
  * opens all of them; the rewrite consolidates them (v2), drops DANGLING
  * positions (data files compacted/replaced away), and on v3 CONVERTS
  * legacy parquet tombstones to deletion vectors. Answers must never
  * change; old snapshots keep their originals. */
class IcebergRewriteDeletesSpec extends SparkSpec {
  import spark.implicits._

  private def posFiles(loc: String): Seq[IcebergImport.DeleteRef] =
    IcebergImport.plan(spark, loc).deletes.filter(_.equalityCols.isEmpty)

  private def ids(loc: String, at: Option[String] = None): Array[Long] =
    IcebergImport.read(spark, loc, at).select("id").as[Long]
      .collect().sorted

  private def metaFile(loc: String) =
    IcebergImport.parseMeta(spark, loc)._3

  test("v2: three delete commits consolidate to a sorted tight set; " +
      "answers and time travel unchanged; the no-op gate holds after") {
    val t = GraftTable(spark, tmpDir("rpd-v2") + "/t")
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 8)
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 5 = 0"))
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 7 = 1"))
    val preRewrite = IcebergWriteBack.deleteWhere(spark, t.location,
      expr("id % 11 = 2"))
    assert(posFiles(t.location).size === 3)
    val expect = (1L to 100L)
      .filter(i => i % 5 != 0 && i % 7 != 1 && i % 11 != 2).toArray
    assert(ids(t.location) === expect)

    val snap = IcebergWriteBack.rewritePositionDeletes(spark, t.location)
    assert(snap !== preRewrite)
    val after = posFiles(t.location)
    assert(after.size < 3 && after.nonEmpty)
    assert(ids(t.location) === expect)
    // the consolidated file(s) hold exactly the distinct live positions,
    // each file sorted by (file_path, pos) — the spec's required order
    val rows = after.flatMap(f => spark.read.parquet(f.uri)
      .select("file_path", "pos").as[(String, Long)].collect().toSeq)
    assert(rows.length === rows.distinct.length)
    after.foreach { f =>
      val fr = spark.read.parquet(f.uri)
        .select("file_path", "pos").as[(String, Long)].collect()
      assert(fr.sameElements(fr.sortBy(r => (r._1, r._2))),
        s"${f.uri} not sorted")
    }
    assert(rows.length === (1L to 100L).count(i =>
      i % 5 == 0 || i % 7 == 1 || i % 11 == 2))
    // time travel: the pre-rewrite snapshot still reads its 3 originals
    assert(ids(t.location, Some(preRewrite.toString)) === expect)
    // external engine agrees on the rewritten tree
    val path = new java.net.URI("file://" + t.location).getPath
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.trim.split("\n").last === expect.length.toString)
    // idempotence: a consolidated tree with no dangling/duplicate rows
    // publishes NOTHING under a high file-count gate
    val mf = metaFile(t.location)
    IcebergWriteBack.rewritePositionDeletes(spark, t.location,
      minInputFiles = 99)
    assert(metaFile(t.location) === mf)
  }

  test("dangling positions drop: tombstones naming replaced data files " +
      "leave the consolidated output (the spec's maintenance rule)") {
    import ForeignFixtures._
    val loc = tmpDir("rpd-dangling") + "/t"
    new java.io.File(loc).mkdirs()
    val d1 = writeParquet(spark, loc, "d1",
      (1L to 10L).map(i => (i, s"a$i")).toDF("id", "v"))
    val d2 = writeParquet(spark, loc, "d2",
      (11L to 20L).map(i => (i, s"b$i")).toDF("id", "v"))
    // one position-delete file spanning BOTH: rows 0,1 of each
    val del = writeParquet(spark, loc, "del",
      Seq((d1, 0L), (d1, 1L), (d2, 0L), (d2, 1L))
        .toDF("file_path", "pos"))
    val schema = schemaJson(0, Seq((1, "id", "long"), (2, "v", "string")))
    writeTree(loc, Seq(schema), 0, Seq.empty, Seq(
      Snap(1, None, 1, "append", Seq(
        Data(d1, 10, 1), Data(d2, 10, 1), PosDel(del, 4, 1))),
      // the foreign engine replaced d2 (e.g. compaction elsewhere);
      // the delete file stays live — its d2 rows are now DANGLING
      Snap(2, Some(1L), 2, "replace", Seq(
        Data(d1, 10, 1), PosDel(del, 4, 1)))))
    assert(ids(loc) === (3L to 10L).toArray)
    IcebergWriteBack.rewritePositionDeletes(spark, loc,
      minInputFiles = 1)
    assert(ids(loc) === (3L to 10L).toArray)
    val after = posFiles(loc)
    val rows = spark.read.parquet(after.map(_.uri): _*)
      .select("file_path", "pos").as[(String, Long)].collect()
    assert(rows.length === 2 && rows.forall(_._1 == d1),
      s"dangling d2 positions must drop, got ${rows.mkString(",")}")
  }

  test("v3: legacy parquet tombstones CONVERT to deletion vectors — " +
      "one DV per data file (merging any DV the upgrade-era deletes " +
      "already wrote), parquet position files leave the read path") {
    val t = GraftTable(spark, tmpDir("rpd-v3") + "/t")
    t.append((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 8)
    // v2-era position deletes (parquet files)
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 5 = 0"))
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 7 = 1"))
    IcebergWriteBack.upgradeFormatVersion(spark, t.location, 3)
    // post-upgrade delete: already a DV, parquet files stay live
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 11 = 2"))
    val p0 = IcebergImport.plan(spark, t.location)
    assert(p0.deletes.count(_.equalityCols.isEmpty) === 2)
    assert(p0.dvs.nonEmpty)
    val expect = (1L to 100L)
      .filter(i => i % 5 != 0 && i % 7 != 1 && i % 11 != 2).toArray
    assert(ids(t.location) === expect)

    val pre = IcebergImport.currentSnapshotId(spark, t.location).get
    IcebergWriteBack.rewritePositionDeletes(spark, t.location)
    val p1 = IcebergImport.plan(spark, t.location)
    assert(p1.deletes.count(_.equalityCols.isEmpty) === 0,
      "parquet position tombstones must leave the read path")
    assert(p1.dvs.nonEmpty &&
      p1.dvs.groupBy(_.dataFileUri).forall(_._2.size == 1),
      "the one-DV-per-data-file invariant must hold after conversion")
    assert(ids(t.location) === expect)
    assert(ids(t.location, Some(pre.toString)) === expect)
    // the independent hand-walker decodes the converted DVs
    val path = new java.net.URI("file://" + t.location).getPath
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.trim.split("\n").last === expect.length.toString)
  }

  test("equality deletes are untouched and a pure-equality tree is a " +
      "no-op; SQL surface runs the v2 consolidation end-to-end") {
    val t = GraftTable(spark, tmpDir("rpd-eq") + "/t")
    t.append((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 8)
    IcebergWriteBack.deleteKeys(spark, t.location,
      Seq(3L, 4L).toDF("id"))
    val mf = metaFile(t.location)
    IcebergWriteBack.rewritePositionDeletes(spark, t.location)
    assert(metaFile(t.location) === mf, "pure-equality tree must no-op")

    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 9 = 0"))
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 8 = 0"))
    val before = posFiles(t.location).map(_.uri).toSet
    assert(before.size === 2)
    spark.sql(
      s"CALL graft.rewrite_position_deletes_iceberg('${t.location}')")
    val after = posFiles(t.location)
    assert(after.nonEmpty && after.forall(f => !before(f.uri)),
      "both input tombstone files must leave the read path")
    assert(after.size < 2)
    val expect = (1L to 50L).filter(i =>
      i != 3 && i != 4 && i % 9 != 0 && i % 8 != 0).toArray
    assert(ids(t.location) === expect)
    // the equality tombstones still apply (their manifests untouched)
    assert(IcebergImport.plan(spark, t.location).deletes
      .exists(_.equalityCols.isDefined))
  }
}
