package graft.iceberg

import scala.sys.process._

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods.parse

import graft.SparkSpec
import graft.table.GraftTable

/** Snapshot refs on FOREIGN Iceberg trees — tags, branches, rollback,
  * fast-forward ([[IcebergWriteBack.createRef]] and friends), and branch
  * COMMITS ([[IcebergWriteBack.appendTo]] `branch =>`): the
  * write-audit-publish lifecycle the reference's multi-engine setup
  * stages releases with (Iceberg's `ALTER TABLE ... CREATE TAG/BRANCH`,
  * `system.rollback_to_snapshot`, `system.fast_forward`). The read side
  * resolves any ref via `at` (IcebergImport.plan, refs map), so every
  * assertion here reads through the public import path; the external
  * DuckDB hand-walker re-reads the published state. */
class IcebergRefsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats

  private def meta(loc: String): JValue = {
    val (_, m, _) = IcebergImport.parseMeta(spark, loc)
    m
  }

  private def ids(loc: String, at: Option[String] = None): Array[Long] =
    IcebergImport.read(spark, loc, at).select("id").as[Long]
      .collect().sorted

  private def freshTree(prefix: String, n: Long = 10L): GraftTable = {
    val t = GraftTable(spark, tmpDir(prefix) + "/t")
    t.append((1L to n).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 8)
    t
  }

  test("tag: a durable time-travel label — pinned content survives " +
      "later commits AND snapshot expiry; drop removes resolution") {
    val t = freshTree("refs-tag")
    val tagged = IcebergWriteBack.createRef(spark, t.location, "v1", "tag")
    assert(tagged === IcebergImport.currentSnapshotId(spark, t.location).get)
    IcebergWriteBack.appendTo(spark, t.location,
      (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergWriteBack.appendTo(spark, t.location,
      (16L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(ids(t.location) === (1L to 20L).toArray)
    assert(ids(t.location, Some("v1")) === (1L to 10L).toArray)
    // expire keeps every ref target: the tag still resolves, its
    // UN-tagged sibling history is gone
    IcebergWriteBack.expireSnapshots(spark, t.location, keepLast = 1)
    assert(ids(t.location, Some("v1")) === (1L to 10L).toArray)
    // drop: the name stops resolving (the snapshot itself stays until
    // the next expire)
    assert(IcebergWriteBack.dropRef(spark, t.location, "v1") === tagged)
    val e = intercept[IllegalArgumentException] {
      IcebergImport.read(spark, t.location, Some("v1")).collect()
    }
    assert(e.getMessage.contains("no ref 'v1'"))
  }

  test("ref creation refusals: duplicate, 'main', dead snapshot id, " +
      "bad type, catalog read-handle; drop refusals: main, missing") {
    val t = freshTree("refs-refuse")
    IcebergWriteBack.createRef(spark, t.location, "r", "tag")
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.createRef(spark, t.location, "r", "branch")
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.createRef(spark, t.location, "main", "branch")
    }.getMessage.contains("managed by commits"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.createRef(spark, t.location, "x", "tag",
        snapshotId = Some(999999L))
    }.getMessage.contains("not in"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.createRef(spark, t.location, "x", "label")
    }.getMessage.contains("tag|branch"))
    // a catalog-resolved metadata.json handle is a read-only pin
    val mf = IcebergImport.parseMeta(spark, t.location)._3.toString
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.createRef(spark, mf, "x", "tag")
    }.getMessage.contains("read-only"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.dropRef(spark, t.location, "main")
    }.getMessage.contains("refusing to drop 'main'"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.dropRef(spark, t.location, "ghost")
    }.getMessage.contains("no ref 'ghost'"))
  }

  test("write-audit-publish: a branch commit is invisible to main " +
      "(current-snapshot-id, snapshot-log, COUNT all untouched), " +
      "readable at the ref, and fast-forward lands it atomically") {
    val t = freshTree("refs-wap")
    val mainHead = IcebergImport.currentSnapshotId(spark, t.location).get
    IcebergWriteBack.createRef(spark, t.location, "audit", "branch")
    val logLen = (meta(t.location) \ "snapshot-log").children.size

    val staged = IcebergWriteBack.appendTo(spark, t.location,
      (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"),
      branch = Some("audit"))
    val m = meta(t.location)
    // audit step: main is byte-for-byte where it was
    assert((m \ "current-snapshot-id").extract[Long] === mainHead)
    assert((m \ "snapshot-log").children.size === logLen)
    assert(ids(t.location) === (1L to 10L).toArray)
    // the staged snapshot chains on the branch head and is readable
    // at the ref only
    assert(ids(t.location, Some("audit")) === (1L to 15L).toArray)
    val snap = (m \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] == staged).get
    assert((snap \ "parent-snapshot-id").extract[Long] === mainHead)
    // sequence numbers stay GLOBAL across refs (the v2 ordering rule)
    assert((m \ "last-sequence-number").extract[Long] >
      (m \ "snapshots").children.filter(s =>
        (s \ "snapshot-id").extract[Long] == mainHead)
        .map(s => (s \ "sequence-number").extract[Long]).head)

    // a second staged commit chains on the BRANCH, not main
    val staged2 = IcebergWriteBack.appendTo(spark, t.location,
      (16L to 18L).map(i => (i, s"v$i")).toDF("id", "v"),
      branch = Some("audit"))
    val m2 = meta(t.location)
    val snap2 = (m2 \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] == staged2).get
    assert((snap2 \ "parent-snapshot-id").extract[Long] === staged)
    assert(ids(t.location) === (1L to 10L).toArray)

    // publish: fast-forward main onto the branch head
    val landed = IcebergWriteBack.fastForward(spark, t.location,
      "main", "audit")
    assert(landed === staged2)
    val m3 = meta(t.location)
    assert((m3 \ "current-snapshot-id").extract[Long] === staged2)
    assert((m3 \ "snapshot-log").children.size === logLen + 1)
    assert(ids(t.location) === (1L to 18L).toArray)
    // external engine reads the published state
    val path = new java.net.URI("file://" + t.location).getPath
    val out = Seq("python3", "tools/read_iceberg_duckdb.py", path,
      "SELECT COUNT(*) AS n FROM t").!!
    assert(out.trim.split("\n").last === "18")
    // idempotent re-run: already at the head, no new version published
    val mfBefore = IcebergImport.parseMeta(spark, t.location)._3
    assert(IcebergWriteBack.fastForward(spark, t.location,
      "main", "audit") === staged2)
    assert(IcebergImport.parseMeta(spark, t.location)._3 === mfBefore)
  }

  test("txn replay honors only REACHABLE stamps: a batch staged on a " +
      "branch that is later abandoned (dropRef, no fast-forward) does " +
      "NOT satisfy the exactly-once check — the replay lands on main") {
    val t = freshTree("refs-txn-abandon")
    val batch = (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v")
    IcebergWriteBack.createRef(spark, t.location, "audit", "branch")
    IcebergWriteBack.appendTo(spark, t.location, batch,
      txn = Some(("cdc-app", 7L)), branch = Some("audit"))
    // while the branch is LIVE the stamp counts: a replay onto main
    // no-ops (the staged rows will land via fast-forward, not twice)
    IcebergWriteBack.appendTo(spark, t.location, batch,
      txn = Some(("cdc-app", 7L)))
    assert(ids(t.location) === (1L to 10L).toArray)
    // abandon the staged line — its snapshots become unreachable
    IcebergWriteBack.dropRef(spark, t.location, "audit")
    assert(IcebergWriteBack.lastCommittedBatch(spark, t.location,
      "cdc-app").isEmpty)
    // the replay must now COMMIT (the rows never landed anywhere a
    // reader can reach) — silently no-oping here loses the batch
    IcebergWriteBack.appendTo(spark, t.location, batch,
      txn = Some(("cdc-app", 7L)))
    assert(ids(t.location) === (1L to 15L).toArray)
    // and the landed stamp is reachable, so a SECOND replay no-ops
    IcebergWriteBack.appendTo(spark, t.location, batch,
      txn = Some(("cdc-app", 7L)))
    assert(ids(t.location) === (1L to 15L).toArray)
  }

  test("branch-commit refusals: missing ref, tag ref, branch => 'main'") {
    val t = freshTree("refs-bc-refuse")
    val df = Seq((99L, "x")).toDF("id", "v")
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.appendTo(spark, t.location, df,
        branch = Some("nope"))
    }.getMessage.contains("no ref 'nope'"))
    IcebergWriteBack.createRef(spark, t.location, "pin", "tag")
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.appendTo(spark, t.location, df,
        branch = Some("pin"))
    }.getMessage.contains("tags are immutable"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.appendTo(spark, t.location, df,
        branch = Some("main"))
    }.getMessage.contains("omitting branch"))
  }

  test("fast-forward refusals: diverged branches never merge, tags " +
      "never move, unknown refs fail loud") {
    val t = freshTree("refs-ff-refuse")
    IcebergWriteBack.createRef(spark, t.location, "b", "branch")
    // diverge: one commit on the branch, one on main
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((11L, "b")).toDF("id", "v"), branch = Some("b"))
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((12L, "m")).toDF("id", "v"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.fastForward(spark, t.location, "main", "b")
    }.getMessage.contains("diverged"))
    IcebergWriteBack.createRef(spark, t.location, "pin", "tag")
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.fastForward(spark, t.location, "pin", "b")
    }.getMessage.contains("fast-forward moves branches"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.fastForward(spark, t.location, "main", "ghost")
    }.getMessage.contains("no ref 'ghost'"))
  }

  test("rollback_to_snapshot: main returns to an ancestor, rolled-past " +
      "commits stay time-travelable, and the next append chains on the " +
      "rolled-back head with a FRESH snapshot id") {
    val t = freshTree("refs-rollback")
    val s0 = IcebergImport.currentSnapshotId(spark, t.location).get
    val s1 = IcebergWriteBack.appendTo(spark, t.location,
      (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"))
    val s2 = IcebergWriteBack.appendTo(spark, t.location,
      (16L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(IcebergWriteBack.rollbackTo(spark, t.location, s0) === s0)
    assert(ids(t.location) === (1L to 10L).toArray)
    // rolled-past state is still reachable by id (until expire)
    assert(ids(t.location, Some(s2.toString)) === (1L to 20L).toArray)
    // snapshot-log recorded the change of current (Iceberg's
    // SetSnapshotOperation appends, never rewrites)
    val log = (meta(t.location) \ "snapshot-log").children
      .map(e => (e \ "snapshot-id").extract[Long])
    assert(log.last === s0 && log.contains(s2))
    // a post-rollback append must NOT reuse the rolled-past ids
    val s3 = IcebergWriteBack.appendTo(spark, t.location,
      Seq((21L, "v21")).toDF("id", "v"))
    assert(s3 > s2 && !Set(s0, s1, s2).contains(s3))
    assert(ids(t.location) === ((1L to 10L) :+ 21L).toArray)
    val m = meta(t.location)
    val snap3 = (m \ "snapshots").children.find(s =>
      (s \ "snapshot-id").extract[Long] == s3).get
    assert((snap3 \ "parent-snapshot-id").extract[Long] === s0)
    // refusals: non-ancestor (s2 is no longer on main's chain after the
    // divergent append) and unknown ids
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.rollbackTo(spark, t.location, s2)
    }.getMessage.contains("not an ancestor"))
    assert(intercept[IllegalArgumentException] {
      IcebergWriteBack.rollbackTo(spark, t.location, 424242L)
    }.getMessage.contains("not in"))
    // no-op rollback to the current head publishes nothing
    val mfBefore = IcebergImport.parseMeta(spark, t.location)._3
    IcebergWriteBack.rollbackTo(spark, t.location, s3)
    assert(IcebergImport.parseMeta(spark, t.location)._3 === mfBefore)
  }

  test("v3 tree: a staged branch commit advances next-row-id and " +
      "last-sequence-number GLOBALLY (row lineage never collides " +
      "across refs), while main stays pinned") {
    val t = freshTree("refs-v3")
    IcebergWriteBack.upgradeFormatVersion(spark, t.location, 3)
    // establish lineage: one main append assigns row ids
    IcebergWriteBack.appendTo(spark, t.location,
      (11L to 12L).map(i => (i, s"v$i")).toDF("id", "v"))
    val before = meta(t.location)
    val ridBefore = (before \ "next-row-id").extract[Long]
    val seqBefore = (before \ "last-sequence-number").extract[Long]
    IcebergWriteBack.createRef(spark, t.location, "stage", "branch")
    IcebergWriteBack.appendTo(spark, t.location,
      (13L to 15L).map(i => (i, s"v$i")).toDF("id", "v"),
      branch = Some("stage"))
    val after = meta(t.location)
    assert((after \ "next-row-id").extract[Long] === ridBefore + 3)
    assert((after \ "last-sequence-number").extract[Long] ===
      seqBefore + 1)
    assert(ids(t.location) === (1L to 12L).toArray)
    IcebergWriteBack.fastForward(spark, t.location, "main", "stage")
    assert(ids(t.location) === (1L to 15L).toArray)
    // landed rows carry the staged commit's lineage: distinct ids,
    // continuing the main sequence
    val allFiles = IcebergImport.plan(spark, t.location)
      .files.map(_.uri).toSet
    val rids = IcebergImport
      .readFileSubsetRowLineage(spark, t.location, allFiles)
      .filter(col("id").between(13, 15))
      .select("_row_id").as[Long].collect().sorted
    assert(rids === Array(ridBefore, ridBefore + 1, ridBefore + 2))
  }

  test("expire keeps a staged branch's FULL segment (not just its " +
      "head), so fast-forward still lands after maintenance; tags " +
      "stay head-only labels") {
    val t = freshTree("refs-expire-seg")
    // some expirable main history first
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((11L, "a")).toDF("id", "v"))
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((12L, "b")).toDF("id", "v"))
    IcebergWriteBack.createRef(spark, t.location, "audit", "branch")
    // a LINEAR two-commit staged segment on the branch
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((13L, "c")).toDF("id", "v"), branch = Some("audit"))
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((14L, "d")).toDF("id", "v"), branch = Some("audit"))
    // maintenance mid-WAP: keepLast=1 may drop old main history but
    // must NOT drop the staged segment's intermediate commit
    IcebergWriteBack.expireSnapshots(spark, t.location, keepLast = 1)
    assert(ids(t.location, Some("audit")) === (1L to 14L).toArray)
    val landed = IcebergWriteBack.fastForward(spark, t.location,
      "main", "audit")
    assert(ids(t.location) === (1L to 14L).toArray)
    assert(IcebergImport.currentSnapshotId(spark, t.location)
      .contains(landed))
  }

  test(".refs metadata view: one row per named ref, main included, " +
      "tracking creates/advances/drops") {
    val t = freshTree("refs-view")
    val head = IcebergImport.currentSnapshotId(spark, t.location).get
    IcebergWriteBack.createRef(spark, t.location, "rel", "tag")
    IcebergWriteBack.createRef(spark, t.location, "audit", "branch")
    def view(): Map[String, (String, Long)] =
      IcebergImport.refs(spark, t.location)
        .as[(String, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val v0 = view()
    assert(v0 === Map("main" -> (("branch", head)),
      "rel" -> (("tag", head)), "audit" -> (("branch", head))))
    val staged = IcebergWriteBack.appendTo(spark, t.location,
      Seq((11L, "x")).toDF("id", "v"), branch = Some("audit"))
    val v1 = view()
    assert(v1("audit") === (("branch", staged)) &&
      v1("main") === (("branch", head)) && v1("rel") === (("tag", head)))
    IcebergWriteBack.fastForward(spark, t.location, "main", "audit")
    assert(view()("main") === (("branch", staged)))
    IcebergWriteBack.dropRef(spark, t.location, "rel")
    assert(!view().contains("rel"))
  }

  test("SQL surface: tag/branch/append(branch)/fast_forward/rollback/" +
      "drop_ref procedures run the same lifecycle end-to-end") {
    val t = freshTree("refs-sql")
    spark.sql(s"CALL graft.tag_iceberg('${t.location}', name => 'rel')")
    spark.sql(
      s"CALL graft.branch_iceberg('${t.location}', name => 'audit')")
    (21L to 25L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("refs_sql_batch")
    spark.sql(s"CALL graft.append_iceberg('${t.location}', " +
      "source => 'refs_sql_batch', branch => 'audit')")
    assert(ids(t.location) === (1L to 10L).toArray)
    spark.sql(s"CALL graft.fast_forward_iceberg('${t.location}', " +
      "branch => 'main', to => 'audit')")
    assert(ids(t.location) === ((1L to 10L) ++ (21L to 25L)).toArray)
    // the tag still pins the pre-WAP state; rollback returns main to it
    assert(ids(t.location, Some("rel")) === (1L to 10L).toArray)
    val relId = (meta(t.location) \ "refs" \ "rel" \ "snapshot-id")
      .extract[Long]
    spark.sql(s"CALL graft.rollback_iceberg('${t.location}', " +
      s"snapshot_id => $relId)")
    assert(ids(t.location) === (1L to 10L).toArray)
    spark.sql(
      s"CALL graft.drop_ref_iceberg('${t.location}', name => 'rel')")
    assert((meta(t.location) \ "refs" \ "rel") === JNothing)
  }
}
