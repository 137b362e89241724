package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** RENAME COLUMN via stable field ids: tables are born with
  * graft.field.id/parquet.field.id metadata, writes stamp the ids into
  * parquet footers, reads resolve by id — so a rename is a zero-file
  * evolve commit and files written under the old name keep their
  * column. Stats/Bloom pruning follows through the statsFor id remap. */
class RenameColumnSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String) = GraftTable(spark, tmpDir(name) + "/t")

  /** numFiles actually read by the executed scan (unwraps AQE). */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case other => other.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    scans(df.queryExecution.executedPlan)
  }

  test("create assigns field ids and the parquet footers carry them") {
    val t = fresh("ren-ids")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val sch = t.schema
    assert(FieldIds.hasIds(sch))
    assert(sch.fields.map(FieldIds.idOf(_).get).toSeq === Seq(1L, 2L))
    // the written file's parquet schema carries the ids (the footer fact
    // id-based reads depend on)
    val file = new org.apache.hadoop.fs.Path(
      t.location, t.liveFiles().head)
    val conf = spark.sessionState.newHadoopConf()
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val pqFields = reader.getFileMetaData.getSchema.getFields
      assert(pqFields.get(0).getId.intValue() === 1)
      assert(pqFields.get(1).getId.intValue() === 2)
    } finally reader.close()
  }

  test("rename round-trip: old files keep their column, new writes mix, " +
      "merge keys on the renamed column work") {
    val t = fresh("ren-rt")
    t.append((1L to 100L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ts")
      .coalesce(1))
    t.renameColumn("v", "label")
    assert(t.schema.fieldNames.toSeq === Seq("id", "label", "ts"))
    // no nulls: the old file's bytes resolve by id
    assert(t.read().filter(col("label").isNull).count() === 0)
    assert(t.read().filter($"id" === 7L).select("label").as[String]
      .collect() === Array("v7"))
    // append under the new name; both generations read together
    t.append(Seq((101L, "new", 2L)).toDF("id", "label", "ts"))
    assert(t.read().count() === 101)
    // a keyed merge after the rename rewrites correctly
    t.merge(Seq((7L, "upd", 3L)).toDF("id", "label", "ts"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "ts")
    assert(t.read().filter($"id" === 7L).select("label").as[String]
      .collect() === Array("upd"))
    assert(t.read().count() === 101)
  }

  test("chained renames and time travel across each epoch") {
    val t = fresh("ren-chain")
    t.append(Seq((1L, "a")).toDF("id", "v").coalesce(1))
    val s1 = t.latestSnapshotId.get
    t.renameColumn("v", "w")
    val s2 = t.latestSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "w"))
    t.renameColumn("w", "x")
    // current: both files under the final name
    assert(t.read().orderBy("id").select("x").as[String].collect() ===
      Array("a", "b"))
    // each epoch shows its own name with full data
    assert(t.readAsOf(s1).columns.toSeq === Seq("id", "v"))
    assert(t.readAsOf(s1).select("v").as[String].collect() === Array("a"))
    assert(t.readAsOf(s2).columns.toSeq === Seq("id", "w"))
    assert(t.readAsOf(s2).select("w").as[String].collect() === Array("a"))
  }

  test("stats and Bloom pruning stay correct on the renamed column") {
    val t = fresh("ren-prune")
    val df = (1L to 100L).map(i => (i, s"a$i", 1L)).toDF("id", "v", "ts")
    t.create(df.schema, properties = Map("graft.bloom.columns" -> "id"))
    t.append(df.coalesce(1))
    t.append((1000L to 1100L).map(i => (i, s"b$i", 1L)).toDF("id", "v", "ts")
      .coalesce(1))
    val loFile = t.liveFiles().find(f =>
      t.statsFor(Seq(f))(f)("id").max.get.toLong <= 100L).get
    t.renameColumn("id", "key")
    // stats resolve under the NEW name (the id-based remap)
    val st = t.statsFor(Seq(loFile))(loFile)
    assert(st.contains("key") && !st.contains("id"))
    assert((st("key").min, st("key").max) === (Some("1"), Some("100")))
    assert(st("key").bloom.isDefined)
    // the bloom-columns property followed the rename
    assert(t.properties("graft.bloom.columns") === "key")
    // scan pruning: a range filter on the renamed column reads ONE file
    assert(scannedFiles(spark.read.format("graft").load(t.location)
      .filter(col("key") <= 50L)) === 1L)
    // merge pruning: a batch in the high range leaves the low file alone
    t.merge(Seq((1000L, "upd", 2L)).toDF("key", "v", "ts"),
      keys = Seq("key"), dedupKey = Seq("key"), orderCol = "ts")
    assert(t.liveFiles().contains(loFile))
    assert(!t.removedFilesOf(t.snapshots.last).contains(loFile))
    assert(t.read().filter(col("key") === 1000L).select("v").as[String]
      .collect() === Array("upd"))
  }

  test("refusals: legacy tables, partition sources, name collisions, " +
      "live MOR tombstones") {
    // legacy name-mapped table (pre-field-id snapshot JSON)
    val legacyLoc = tmpDir("ren-legacy") + "/t"
    new java.io.File(legacyLoc, "_graft").mkdirs()
    val legacy = GraftTable(spark, legacyLoc)
    val plain = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    legacy.commit("create", Seq.empty, Seq.empty, _ => plain.json,
      Seq.empty)
    val e1 = intercept[IllegalArgumentException](
      legacy.renameColumn("v", "w"))
    assert(e1.getMessage.contains("field ids"))

    val t = fresh("ren-refuse")
    t.append(Seq((1L, "a", "p1")).toDF("id", "v", "part"),
      parts = Seq("part"))
    val e2 = intercept[IllegalArgumentException](
      t.renameColumn("part", "region"))
    assert(e2.getMessage.contains("partition source"))
    val e3 = intercept[IllegalArgumentException](
      t.renameColumn("v", "ID"))
    assert(e3.getMessage.contains("already exists"))
    intercept[IllegalArgumentException](t.renameColumn("ghost", "g2"))

    // dropped name cannot be renamed onto (historical ambiguity)
    val t2 = fresh("ren-hist")
    t2.append(Seq((1L, "a", 1)).toDF("id", "v", "n"))
    t2.dropColumns(Seq("n"))
    val e4 = intercept[IllegalArgumentException](
      t2.renameColumn("v", "n"))
    assert(e4.getMessage.contains("earlier schema"))

    // live MOR tombstones keying on the column
    val t3 = fresh("ren-mor")
    t3.append((1L to 20L).map(i => (i, s"v$i", 1L)).toDF("id", "v", "ts"))
    t3.merge(Seq((5L, "u", 2L)).toDF("id", "v", "ts"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "ts",
      mode = "mor")
    val e5 = intercept[IllegalArgumentException](
      t3.renameColumn("id", "key"))
    assert(e5.getMessage.contains("tombstones"))
    t3.renameColumn("v", "label") // non-key column renames fine
    assert(t3.read().filter($"id" === 5L).select("label").as[String]
      .collect() === Array("u"))
  }

  test("changelog and incremental reads resolve renamed columns") {
    val t = fresh("ren-cdc")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val s1 = t.latestSnapshotId.get
    t.renameColumn("v", "w")
    t.append(Seq((3L, "c")).toDF("id", "w"))
    // incremental over the rename boundary: post-rename schema
    val inc = t.readIncremental(s1, t.latestSnapshotId.get)
    assert(inc.columns.toSeq === Seq("id", "w"))
    assert(inc.select("w").as[String].collect() === Array("c"))
    // full changelog: pre-rename file contents surface under the current
    // name with no nulls
    val lo = t.snapshots.head.snapshotId - 1
    val ch = t.changes(lo, t.latestSnapshotId.get)
    assert(ch.filter(col("w").isNull).count() === 0)
    assert(ch.count() === 3)
  }

  // ---- legacy retrofit: rewrite-on-demand unlocks RENAME ----

  /** A table whose create predates field ids: plain-schema create commit
    * plus an append staged WITHOUT id metadata (the legacy write path). */
  private def mkLegacy(name: String): GraftTable = {
    val loc = tmpDir(name) + "/t"
    new java.io.File(loc, "_graft").mkdirs()
    val t = GraftTable(spark, loc)
    val plain = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    t.commit("create", Seq.empty, Seq.empty, _ => plain.json, Seq.empty)
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1))
    assert(!FieldIds.hasIds(t.schema))
    t
  }

  test("retrofitFieldIds rewrites a legacy table with ids and unlocks " +
      "RENAME; time travel keeps name-mapped history") {
    val t = mkLegacy("retro-basic")
    val preRetrofit = t.latestSnapshotId.get
    val filesBefore = t.liveFiles().toSet
    intercept[IllegalArgumentException](t.renameColumn("v", "w"))
    t.retrofitFieldIds()
    // a full rewrite: every legacy file replaced, schema now carries ids
    assert(t.liveFiles().toSet.intersect(filesBefore).isEmpty)
    assert(FieldIds.hasIds(t.schema))
    assert(t.snapshots.last.operation === "retrofit")
    assert(t.read().orderBy("id").as[(Long, String)].collect()
      === Array((1L, "a"), (2L, "b"), (3L, "c")))
    // RENAME now works, and pre-retrofit time travel still resolves by
    // name over the original id-less files
    t.renameColumn("v", "w")
    assert(t.read().orderBy("id").select("w").as[String].collect()
      === Array("a", "b", "c"))
    assert(t.readAsOf(preRetrofit).orderBy("id").select("v").as[String]
      .collect() === Array("a", "b", "c"))
    // appends after the retrofit+rename land under the new name
    t.append(Seq((4L, "d")).toDF("id", "w"))
    assert(t.read().count() === 4)
  }

  test("retrofit is a no-op on id-born tables and data-equivalent for " +
      "the changelog") {
    val born = fresh("retro-noop")
    born.append(Seq((1L, "a")).toDF("id", "v"))
    val tip = born.latestSnapshotId.get
    assert(born.retrofitFieldIds() === tip) // no new commit
    assert(born.snapshots.size === 2)

    val t = mkLegacy("retro-cdc")
    val lo = t.snapshots.head.snapshotId - 1
    t.retrofitFieldIds()
    // the rewrite emits no CDC rows: 3 inserts total, no deletes
    val ch = t.changes(lo, t.latestSnapshotId.get)
    assert(ch.filter(col("_change_type") === "delete").count() === 0)
    assert(ch.count() === 3)
  }

  test("retrofit folds live MOR tombstones into the rewrite") {
    val t = mkLegacy("retro-mor")
    t.merge(Seq((2L, "updated")).toDF("id", "v"), Seq("id"), Seq("id"),
      "id", mode = "mor")
    assert(t.liveDeletes().nonEmpty)
    t.retrofitFieldIds()
    assert(t.liveDeletes().isEmpty)
    assert(FieldIds.hasIds(t.schema))
    assert(t.read().filter(col("id") === 2L).select("v").as[String]
      .collect() === Array("updated"))
    assert(t.read().count() === 3)
  }
}
