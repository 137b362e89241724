package graft.table

import graft.SparkSpec

/** Named snapshot branches (Iceberg branch refs): write-audit-publish
  * onto a branch, branch-chain reads, atomic fast-forward onto main,
  * divergence conflicts, abandonment, and ref-retention pinning. */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  test("commits on a branch are invisible to main until fastForward") {
    val t = GraftTable(spark, tmpDir("branch-basic") + "/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val mainTip = t.latestSnapshotId.get

    t.createBranch("audit")
    val b = t.branch("audit")
    b.append(Seq((3L, "c")).toDF("id", "v"))
    b.append(Seq((4L, "d")).toDF("id", "v"))

    // branch sees fork-point rows + its own commits; main sees neither
    assert(b.read().count() === 4)
    assert(t.read().count() === 2)
    assert(t.latestSnapshotId.get === mainTip)
    assert(t.branches === Map("audit" -> mainTip))

    // audit passed: publish. Main gets BOTH branch commits, as history
    // (not a squash) — ids, parents and operations carry over verbatim
    val newTip = t.fastForward("audit")
    assert(newTip === mainTip + 2)
    assert(t.read().as[(Long, String)].collect().sortBy(_._1).map(_._1)
      === Array(1L, 2L, 3L, 4L))
    assert(t.snapshots.map(_.snapshotId) === (0L to newTip))
    assert(t.snapshots.drop(1).map(_.parentId.get) === (0L until newTip))
    assert(t.branches.isEmpty) // ref consumed

    // time travel across the published boundary still works
    assert(t.readAsOf(mainTip).count() === 2)
    assert(t.readAsOf(mainTip + 1).count() === 3)
  }

  test("fastForward conflicts when main advanced past the fork point") {
    val t = GraftTable(spark, tmpDir("branch-conflict") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("wap")
    val b = t.branch("wap")
    b.append(Seq((2L, "staged")).toDF("id", "v"))
    // main moves on — the branch is now divergent
    t.append(Seq((9L, "main")).toDF("id", "v"))

    intercept[java.util.ConcurrentModificationException] {
      t.fastForward("wap")
    }
    // main untouched by the failed publish; branch still intact
    assert(t.read().as[(Long, String)].collect().map(_._1).sorted
      === Array(1L, 9L))
    assert(t.branch("wap").read().count() === 2)
    t.dropBranch("wap")
  }

  test("dropBranch abandons staged commits; orphan sweep reclaims files") {
    val t = GraftTable(spark, tmpDir("branch-drop") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("tmp")
    val b = t.branch("tmp")
    b.append(Seq((2L, "x")).toDF("id", "v"))
    val stagedFiles = b.liveFiles().toSet -- t.liveFiles().toSet
    assert(stagedFiles.nonEmpty)

    // while the branch lives, its staged files are NOT orphans
    assert(t.removeOrphanFiles(olderThanMs = 0).isEmpty)
    t.dropBranch("tmp")
    assert(t.branches.isEmpty)
    intercept[IllegalArgumentException] { t.branch("tmp") }
    // now they are
    val swept = t.removeOrphanFiles(olderThanMs = 0).toSet
    assert(stagedFiles.subsetOf(swept))
    assert(t.read().count() === 1)
  }

  test("branch schema evolution stays on the branch until published") {
    val t = GraftTable(spark, tmpDir("branch-evolve") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("schema2")
    val b = t.branch("schema2")
    b.append(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), mergeSchema = true)

    assert(t.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(b.schema.fieldNames.toSeq === Seq("id", "v", "score"))
    t.fastForward("schema2")
    assert(t.schema.fieldNames.toSeq === Seq("id", "v", "score"))
    val rows = t.read().orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) === 7.5)
  }

  test("MERGE on a branch, incremental branch scans, and MOR reads work") {
    val t = GraftTable(spark, tmpDir("branch-merge") + "/t")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.createBranch("fix")
    val b = t.branch("fix")
    val from = b.latestSnapshotId.get
    b.merge(Seq((2L, "B!"), (3L, "c")).toDF("id", "v"),
      keys = Seq("id"), dedupKey = Seq("id"), orderCol = "id")
    // branch state merged; main pristine
    assert(b.read().as[(Long, String)].collect().sortBy(_._1)
      === Array((1L, "a"), (2L, "B!"), (3L, "c")))
    assert(t.read().as[(Long, String)].collect().sortBy(_._1)
      === Array((1L, "a"), (2L, "b")))
    // incremental scan over the branch's own APPEND range (the merge
    // commit above is a rewrite — incremental reads refuse those)
    b.append(Seq((4L, "d")).toDF("id", "v"))
    assert(b.readIncremental(b.latestSnapshotId.get - 1,
      b.latestSnapshotId.get).count() === 1)
    t.fastForward("fix")
    assert(t.read().as[(Long, String)].collect().sortBy(_._1)
      === Array((1L, "a"), (2L, "B!"), (3L, "c"), (4L, "d")))
  }

  test("expire pins the fork point of a live branch") {
    val t = GraftTable(spark, tmpDir("branch-pin") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v")) // create=snap 0, append=snap 1
    t.append(Seq((2L, "b")).toDF("id", "v")) // snap 2
    t.createBranch("keep") // fork at 2
    t.append(Seq((3L, "c")).toDF("id", "v")) // snap 3
    t.append(Seq((4L, "d")).toDF("id", "v")) // snap 4
    t.expireSnapshots(keepLast = 1)
    // the fork point (and everything after it) survives: keepLast=1 would
    // otherwise leave only snap 4
    assert(t.snapshots.map(_.snapshotId) === Seq(2L, 3L, 4L))
    assert(t.branch("keep").read().count() === 2) // branch still readable
    t.dropBranch("keep")
  }

  test("branch/tag namespace is shared; invalid and duplicate names refuse") {
    val t = GraftTable(spark, tmpDir("branch-names") + "/t")
    t.append(Seq((1L, "a")).toDF("id", "v"))
    t.tag("v1")
    intercept[IllegalArgumentException] { t.createBranch("v1") }
    intercept[IllegalArgumentException] { t.createBranch("9lives") }
    t.createBranch("dev")
    intercept[IllegalStateException] { t.createBranch("dev") }
    t.dropBranch("dev")
  }

  test("SQL surface: CALL graft.branch / fast_forward, VERSION AS OF branch") {
    val wh = tmpDir("branch-sql-wh")
    val cat = graft.catalog.GraftCatalog(spark, wh)
    cat.createFrom("br_t", Seq((1L, "a")).toDF("id", "v"))
    spark.sql("CALL graft.branch('br_t', 'wap')")
    val b = cat.table("br_t").branch("wap")
    b.append(Seq((2L, "b")).toDF("id", "v"))

    // main query unchanged; branch readable by name through time travel
    assert(spark.sql("SELECT count(*) FROM br_t").as[Long].collect()(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM br_t VERSION AS OF 'wap'")
      .as[Long].collect()(0) === 2L)
    assert(spark.read.format("graft").option("branch", "wap")
      .load(s"$wh/br_t").count() === 2L)

    assert(spark.sql("CALL graft.fast_forward('br_t', 'wap')")
      .as[Long].collect()(0) === cat.table("br_t").latestSnapshotId.get)
    assert(spark.sql("SELECT count(*) FROM br_t").as[Long].collect()(0) === 2L)
    cat.drop("br_t")
  }
}
