package graft.iceberg

import scala.sys.process._

import org.apache.spark.sql.functions._
import org.json4s._

import graft.SparkSpec
import graft.table.GraftTable

/** Spec-fidelity of the metadata graft PUBLISHES into foreign trees:
  * truthful snapshot-summary metrics (the standard keys external
  * engines surface in their history views — added/deleted files and
  * records, running totals) and `metadata-log` maintenance (every
  * commit records the file it superseded, capped like Iceberg's
  * write.metadata.previous-versions-max). Numbers are asserted against
  * independently-computed expectations, never against the writer's own
  * arithmetic. */
class IcebergMetadataFidelitySpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats

  private def tipSummary(loc: String): Map[String, String] = {
    val (_, meta, _) = IcebergImport.parseMeta(spark, loc)
    val cur = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] == cur).get
    (snap \ "summary") match {
      case JObject(fs0) => fs0.collect {
        case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
  }

  private def metaLog(loc: String): List[(Long, String)] = {
    val (_, meta, _) = IcebergImport.parseMeta(spark, loc)
    (meta \ "metadata-log").children.map(e =>
      ((e \ "timestamp-ms").extract[Long],
        (e \ "metadata-file").extract[String]))
  }

  test("append: added/total metrics match independent counts; the " +
      "delete commit adds delete files without touching total-records; " +
      "the rewritten-manifest commit reports its deletions") {
    val t = GraftTable(spark, tmpDir("fid-sum") + "/t")
    t.append((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 4)

    IcebergWriteBack.appendTo(spark, t.location,
      (41L to 55L).map(i => (i, s"v$i")).toDF("id", "v"))
    val s1 = tipSummary(t.location)
    assert(s1("operation") === "append")
    assert(s1("added-records") === "15")
    assert(s1("total-records") === "55")
    assert(s1("added-delete-files") === "0")
    assert(s1("total-data-files").toLong ===
      IcebergImport.plan(spark, t.location).files.size.toLong)

    // position delete: tombstones are DELETE files, data rows stay in
    // total-records (they still exist in data files — the spec's
    // accounting; the MOR read subtracts, the totals do not)
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 5 = 0"))
    val s2 = tipSummary(t.location)
    assert(s2("operation") === "delete")
    assert(s2("added-delete-files").toLong >= 1L)
    assert(s2("added-records") === "0")
    assert(s2("total-records") === "55")
    assert(s2("total-delete-files").toLong >= 1L)

    // consolidation rewrites delete manifests: the replaced entries are
    // reported as removed delete files, totals reflect the new state
    IcebergWriteBack.deleteWhere(spark, t.location, expr("id % 7 = 1"))
    IcebergWriteBack.rewritePositionDeletes(spark, t.location)
    val s3 = tipSummary(t.location)
    assert(s3("operation") === "replace")
    assert(s3("removed-delete-files").toLong >= 2L,
      s"consolidation must report the retired tombstone files, got $s3")
    assert(s3("added-delete-files").toLong >= 1L)
    assert(s3("total-records") === "55")

    // the .snapshots view exposes the full bag
    val viewed = IcebergImport.snapshots(spark, t.location)
      .orderBy(col("sequence_number").desc).limit(1)
      .select("summary").as[Map[String, String]].collect()(0)
    assert(viewed === s3)
    // external engine: unaffected by the richer summaries
    val path = new java.net.URI("file://" + t.location).getPath
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.trim.split("\n").last === (1L to 55L).count(i =>
      i % 5 != 0 && i % 7 != 1).toString)
  }

  test("compaction reports deleted-data-files/deleted-records for the " +
      "rewritten inputs and truthful new totals") {
    val t = GraftTable(spark, tmpDir("fid-comp") + "/t")
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 4)
    (1 to 3).foreach(k => IcebergWriteBack.appendTo(spark, t.location,
      ((10L + k) to (10L + k)).map(i => (i, s"v$i")).toDF("id", "v")))
    val pre = IcebergImport.plan(spark, t.location).files.size
    IcebergWriteBack.compactSmallFiles(spark, t.location,
      smallFileBytes = 32L << 20, targetFileBytes = 128L << 20,
      minInputFiles = 2)
    val s = tipSummary(t.location)
    assert(s("operation") === "replace")
    assert(s("deleted-data-files").toLong >= 2L,
      s"compaction must report its consumed inputs, got $s")
    assert(s("added-data-files").toLong >= 1L)
    val post = IcebergImport.plan(spark, t.location).files.size
    assert(s("total-data-files").toLong === post.toLong && post < pre)
    assert(s("total-records") === "13")
  }

  test("export stamps truthful total-* metrics on every exported " +
      "snapshot (added-* omitted: the export synthesizes full state)") {
    val t = GraftTable(spark, tmpDir("fid-exp") + "/t")
    t.append((1L to 30L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.append((31L to 45L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 2)
    val (_, meta, _) = IcebergImport.parseMeta(spark, t.location)
    val cur = (meta \ "current-snapshot-id").extract[Long]
    val snap = (meta \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] == cur).get
    assert((snap \ "summary" \ "total-records")
      .extract[String] === "45")
    assert((snap \ "summary" \ "total-data-files").extract[String]
      .toLong === IcebergImport.plan(spark, t.location).files.size)
    assert((snap \ "summary" \ "added-records") === JNothing)
    // every exported snapshot carries its OWN state's totals
    val prev = (meta \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] != cur).get
    assert((prev \ "summary" \ "total-records")
      .extract[String] === "30")
  }

  test("metadata-log: every commit appends the file it superseded, " +
      "stamped with THAT version's last-updated-ms; ref ops and " +
      "upgrades maintain it too; the cap bounds growth") {
    val t = GraftTable(spark, tmpDir("fid-log") + "/t")
    t.append((1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 4)
    val (_, m0, f0) = IcebergImport.parseMeta(spark, t.location)
    val ts0 = (m0 \ "last-updated-ms").extract[Long]
    val base = metaLog(t.location).size

    IcebergWriteBack.appendTo(spark, t.location,
      Seq((6L, "v6")).toDF("id", "v"))
    val log1 = metaLog(t.location)
    assert(log1.size === base + 1)
    assert(log1.last._2.endsWith(f0.getName) && log1.last._1 === ts0,
      s"the superseded file must join the tail with its own " +
        s"timestamp, got ${log1.last}")

    // metadata-only paths maintain the log the same way
    val f1 = IcebergImport.parseMeta(spark, t.location)._3
    IcebergWriteBack.createRef(spark, t.location, "keep", "tag")
    val log2 = metaLog(t.location)
    assert(log2.size === base + 2 && log2.last._2.endsWith(f1.getName))
    val f2 = IcebergImport.parseMeta(spark, t.location)._3
    IcebergWriteBack.upgradeFormatVersion(spark, t.location, 3)
    val log3 = metaLog(t.location)
    assert(log3.size === base + 3 && log3.last._2.endsWith(f2.getName))

    // chronological and unique
    assert(log3.map(_._1).sliding(2).forall(p =>
      p.size < 2 || p(0) <= p(1)))
    assert(log3.map(_._2).distinct.size === log3.size)
    assert(log3.size <= 100)
  }
}
