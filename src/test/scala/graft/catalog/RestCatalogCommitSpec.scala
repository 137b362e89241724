package graft.catalog

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

import graft.SparkSpec
import graft.iceberg.{IcebergExport, IcebergImport, IcebergWriteBack}
import graft.table.GraftTable

/** REST catalog COMMITS against an in-process loopback catalog — the
  * write half of the protocol seam ([[RestCatalog.commitTable]] /
  * [[IcebergWriteBack.appendToCatalog]]): the client writes data,
  * manifests and the manifest list under the table location, then
  * POSTs `CommitTableRequest` (add-snapshot + set-snapshot-ref guarded
  * by assert-ref-snapshot-id) and the CATALOG writes the next
  * metadata.json and swaps its pointer. The loopback server implements
  * exactly that server-side contract (apply updates, enforce
  * requirements with 409, persist a new metadata file), so the
  * round-trip — commit through the catalog, read back through the
  * catalog — runs with zero egress. */
class RestCatalogCommitSpec extends SparkSpec {
  import spark.implicits._

  private implicit val fmts: Formats = DefaultFormats

  private def withCatalog(ident: String, metadataLoc: String)
      (body: (String, graft.tools.LoopbackIcebergCatalog) => Unit)
      : Unit = {
    val cat = new graft.tools.LoopbackIcebergCatalog(ident, metadataLoc)
    val base = cat.start()
    try body(base, cat) finally cat.stop()
  }

  private def freshTree(prefix: String): GraftTable = {
    val t = GraftTable(spark, tmpDir(prefix) + "/t")
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 4)
    t
  }

  private def latestMeta(t: GraftTable): String =
    new File(t.location, "metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json"))
      .map(_.getAbsolutePath).sorted.last

  test("catalog-committed append: client writes data+manifests, the " +
      "catalog applies add-snapshot/set-snapshot-ref and swaps its " +
      "pointer; chained commits build on catalog state; reads through " +
      "the catalog see each step") {
    val t = freshTree("ccommit")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      val s1 = IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"))
      // the catalog moved its pointer to a file IT wrote
      assert(cat.location.endsWith("-rest.metadata.json"))
      def catRead(at: Option[String] = None): Array[Long] =
        IcebergImport.read(spark,
          RestCatalog.loadTableMetadataLocation(base, "lake.t"), at)
          .select("id").as[Long].collect().sorted
      assert(catRead() === (1L to 15L).toArray)
      // the committed snapshot carries the truthful summary metrics
      val meta = parse(new String(Files.readAllBytes(
        new File(cat.location).toPath), StandardCharsets.UTF_8))
      val snap = (meta \ "snapshots").children.find(s =>
        (s \ "snapshot-id").extract[Long] == s1).get
      assert((snap \ "summary" \ "added-records")
        .extract[String] === "5")
      assert((snap \ "summary" \ "total-records")
        .extract[String] === "15")
      // chained: the next catalog commit parents on s1
      val s2 = IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((16L, "v16")).toDF("id", "v"))
      val meta2 = parse(new String(Files.readAllBytes(
        new File(cat.location).toPath), StandardCharsets.UTF_8))
      val snap2 = (meta2 \ "snapshots").children.find(s =>
        (s \ "snapshot-id").extract[Long] == s2).get
      assert((snap2 \ "parent-snapshot-id").extract[Long] === s1)
      assert(catRead() === (1L to 16L).toArray)
      // SQL surface: identifier + catalog_uri commits the same way
      (17L to 18L).map(i => (i, s"v$i")).toDF("id", "v")
        .createOrReplaceTempView("ccommit_batch")
      spark.sql("CALL graft.append_iceberg('lake.t', " +
        s"source => 'ccommit_batch', catalog_uri => '$base')")
      assert(catRead() === (1L to 18L).toArray)
    }
  }

  test("streaming sink through the catalog: micro-batches land " +
      "exactly-once via catalog commits (txn stamps in summaries); a " +
      "replayed batch no-ops against catalog-resolved state") {
    val t = freshTree("ccommit-stream")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      val raw = tmpDir("ccommit-raw")
      (11L to 14L).map(i => (i, s"v$i")).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(raw)
      val stream = spark.readStream
        .schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1).parquet(raw)
      val ckpt = tmpDir("ccommit-ckpt")
      val q = graft.streaming.Streaming.icebergCatalogSink(stream,
        base, "lake.t", "ccommit-app")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      assert(IcebergImport.read(spark, loc).select("id").as[Long]
        .collect().sorted === (1L to 14L).toArray)
      assert(IcebergWriteBack.lastCommittedBatch(spark, loc,
        "ccommit-app").exists(_ >= 0))
      // replay: a LOST checkpoint re-delivers every batch from 0 —
      // the (appId, batchId) stamps in the snapshot summaries no-op
      // each one, so the catalog pointer must not move
      val before = cat.location
      val q2 = graft.streaming.Streaming.icebergCatalogSink(
        spark.readStream.schema(spark.read.parquet(raw).schema)
          .option("maxFilesPerTrigger", 1).parquet(raw),
        base, "lake.t", "ccommit-app")
        .option("checkpointLocation", tmpDir("ccommit-ckpt2")).start()
      try q2.processAllAvailable() finally q2.stop()
      assert(cat.location === before,
        "a replayed stream must not publish new catalog versions")
      assert(IcebergImport.read(spark, loc).count() === 14L)
    }
  }

  test("a stale assert-ref-snapshot-id is refused with the protocol's " +
      "409 and surfaces as the same loud retry contract as a lost " +
      "filesystem rename") {
    val t = freshTree("ccommit-409")
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      val head = IcebergImport.currentSnapshotId(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.t")).get
      // advance the catalog once, then replay the OLD head as the
      // requirement — the concurrent-committer shape
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((11L, "x")).toDF("id", "v"))
      val e = intercept[IllegalStateException] {
        RestCatalog.commitTable(base, "lake.t",
          requirements = Seq(
            ("type" -> "assert-ref-snapshot-id") ~ ("ref" -> "main") ~
              ("snapshot-id" -> head): JValue),
          updates = Seq.empty)
      }
      assert(e.getMessage.contains("409") &&
        e.getMessage.contains("retry"))
    }
  }

  test("row-level ops through the catalog: merge (equality + " +
      "position), deleteWhere, deleteKeys — and the add-spec update " +
      "when a partitioned tree's delete manifest needs a fresh " +
      "unpartitioned spec") {
    val t = GraftTable(spark, tmpDir("ccommit-row") + "/t")
    t.append((1L to 20L).map(i => (i, s"g${i % 3}"))
      .toDF("id", "grp"), parts = Seq("grp"))
    IcebergExport.export(spark, t, history = 4)
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      def state(): Map[Long, String] =
        IcebergImport.read(spark, loc).as[(Long, String)]
          .collect().toMap
      // equality-delete MERGE (the streaming upsert shape)
      IcebergWriteBack.mergeIntoCatalog(spark, base, "lake.t",
        Seq((5L, "UP"), (21L, "NEW")).toDF("id", "grp"),
        keys = Seq("id"), equalityDeletes = true)
      val s1 = state()
      assert(s1(5L) === "UP" && s1(21L) === "NEW" && s1.size === 21)
      // position delete: the identity-partitioned tree has no
      // unpartitioned spec — the delete manifest needs one, and it
      // must arrive via the protocol's add-spec update
      IcebergWriteBack.deleteWhereCatalog(spark, base, "lake.t",
        expr("id % 4 = 0"))
      val s2 = state()
      assert(s2.size === 21 - (1L to 20L).count(_ % 4 == 0) &&
        s2.keys.forall(_ % 4 != 0))
      val meta = parse(new String(Files.readAllBytes(
        new File(cat.location).toPath), StandardCharsets.UTF_8))
      assert((meta \ "partition-specs").children.exists(s =>
        (s \ "fields").children.isEmpty),
        "the unpartitioned delete spec must register via add-spec")
      // keyed equality delete
      IcebergWriteBack.deleteKeysCatalog(spark, base, "lake.t",
        Seq(21L).toDF("id"))
      assert(!state().contains(21L))
      // SQL surface: identifier + catalog_uri route the same way
      Seq((2L, "SQLUP")).toDF("id", "grp")
        .createOrReplaceTempView("ccommit_row_src")
      spark.sql("CALL graft.merge_iceberg('lake.t', " +
        "source => 'ccommit_row_src', keys => 'id', " +
        s"deletes => 'equality', catalog_uri => '$base')")
      assert(state()(2L) === "SQLUP")
      // external engine reads the final catalog state THROUGH the
      // catalog's metadata-location handle (directory resolution would
      // see the stale pre-catalog version-hint — exactly why real
      // engines take the location from the catalog)
      val out = scala.sys.process.Process(Seq("python3",
        "tools/read_iceberg_duckdb.py", cat.location,
        "SELECT COUNT(*) AS n FROM t")).!!
      assert(out.trim.split("\n").last === state().size.toString)
    }
  }

  test("ref management through the catalog: create (tag + branch) via " +
      "set-snapshot-ref with the null-assert create guard, drop via " +
      "remove-snapshot-ref, rollback and fast-forward moving main — " +
      "all in catalog-owned metadata") {
    val t = freshTree("ccommit-refs")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      def refs(): Map[String, (String, Long)] =
        IcebergImport.refs(spark, loc).as[(String, String, Long)]
          .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val head = IcebergImport.currentSnapshotId(spark, loc).get
      IcebergWriteBack.createRef(spark, loc, "rel", "tag",
        catalog = Some((base, "lake.t")))
      IcebergWriteBack.createRef(spark, loc, "audit", "branch",
        catalog = Some((base, "lake.t")))
      assert(refs()("rel") === (("tag", head)) &&
        refs()("audit") === (("branch", head)))
      // duplicate create: the client refuses first, and the protocol's
      // NULL-assert guard 409s a racing creator server-side
      assert(intercept[IllegalArgumentException] {
        IcebergWriteBack.createRef(spark, loc, "rel", "tag",
          catalog = Some((base, "lake.t")))
      }.getMessage.contains("already exists"))
      assert(intercept[IllegalStateException] {
        RestCatalog.commitTable(base, "lake.t",
          requirements = Seq((("type" -> "assert-ref-snapshot-id") ~
            ("ref" -> "audit") ~ ("snapshot-id" -> JNull)): JValue),
          updates = Seq.empty)
      }.getMessage.contains("409"))
      // stage on the branch, fast-forward main through the catalog
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((11L, "x")).toDF("id", "v"), branch = Some("audit"))
      val staged = refs()("audit")._2
      IcebergWriteBack.fastForward(spark, loc, "main", "audit",
        catalog = Some((base, "lake.t")))
      assert(IcebergImport.currentSnapshotId(spark, loc).get === staged)
      // rollback main to the tagged ancestor through the catalog
      spark.sql("CALL graft.rollback_iceberg('lake.t', " +
        s"snapshot_id => $head, catalog_uri => '$base')")
      assert(IcebergImport.currentSnapshotId(spark, loc).get === head)
      assert(IcebergImport.read(spark, loc).count() === 10L)
      // drop through the catalog (SQL route)
      spark.sql("CALL graft.drop_ref_iceberg('lake.t', " +
        s"name => 'rel', catalog_uri => '$base')")
      assert(!refs().contains("rel"))
      assert(cat.location.endsWith("-rest.metadata.json"))
    }
  }

  test("expire through the catalog: the protocol's remove-snapshots " +
      "update trims catalog-owned history while refs and the head " +
      "survive; expired ids stop resolving") {
    val t = freshTree("ccommit-exp")
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      val s1 = IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((11L, "x")).toDF("id", "v"))
      IcebergWriteBack.createRef(spark, loc, "pin", "tag",
        snapshotId = Some(s1), catalog = Some((base, "lake.t")))
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((12L, "y")).toDF("id", "v"))
      val preCount = IcebergImport.snapshots(spark, loc).count()
      val dropped = spark.sql("CALL graft.expire_iceberg('lake.t', " +
        s"keep_last => 1, catalog_uri => '$base')")
        .collect()(0).getLong(0)
      assert(dropped >= 1)
      assert(IcebergImport.snapshots(spark, loc).count() ===
        preCount - dropped)
      // the tagged snapshot survives and still reads; the head reads
      assert(IcebergImport.read(spark, loc, Some("pin"))
        .count() === 11L)
      assert(IcebergImport.read(spark, loc).count() === 12L)
      // an expired id fails loud, exactly like the filesystem path
      val exportEra = IcebergImport.snapshots(spark, loc)
        .select("snapshot_id").as[Long].collect().toSet
      intercept[Exception] {
        IcebergImport.read(spark, loc,
          Some((exportEra.max + 999999L).toString)).collect()
      }
    }
  }

  test("v3 trees refuse catalog commits loudly (next-row-id is " +
      "catalog-maintained state add-snapshot cannot advance)") {
    val t = freshTree("ccommit-v3")
    IcebergWriteBack.upgradeFormatVersion(spark, t.location, 3)
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      val e = intercept[IllegalArgumentException] {
        IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
          Seq((99L, "x")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("v2 trees only"))
    }
  }

  test("streaming CDC merge sink through the catalog: keep-latest " +
      "dedup per batch, equality-delete upsert, exactly-once stamps") {
    val t = freshTree("ccommit-cdc")
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      val raw = tmpDir("ccommit-cdc-raw")
      Seq((5L, "old", 1L), (5L, "new", 2L), (11L, "ins", 1L))
        .toDF("id", "v", "ts")
        .coalesce(1).write.mode("append").parquet(raw)
      val stream = spark.readStream
        .schema(spark.read.parquet(raw).schema).parquet(raw)
      val q = graft.streaming.Streaming.icebergCatalogMergeSink(stream,
        base, "lake.t", "ccommit-cdc", keys = Seq("id"),
        orderCol = "ts")
        .option("checkpointLocation", tmpDir("ccommit-cdc-ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      val got = IcebergImport.read(spark, loc).as[(Long, String)]
        .collect().toMap
      assert(got(5L) === "new" && got(11L) === "ins" &&
        got.size === 11)
    }
  }

  test("WAP through the catalog: a branch commit advances only its " +
      "ref in catalog-owned metadata; main stays pinned until the ref " +
      "is landed") {
    val t = freshTree("ccommit-wap")
    // the branch ref must exist in the metadata the catalog serves:
    // create it filesystem-side BEFORE handing the pointer over
    IcebergWriteBack.createRef(spark, t.location, "audit", "branch")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        (11L to 13L).map(i => (i, s"v$i")).toDF("id", "v"),
        branch = Some("audit"))
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      assert(IcebergImport.read(spark, loc).count() === 10L)
      assert(IcebergImport.read(spark, loc, Some("audit"))
        .count() === 13L)
      val meta = parse(new String(Files.readAllBytes(
        new File(cat.location).toPath), StandardCharsets.UTF_8))
      assert((meta \ "snapshot-log").children.isEmpty ||
        (meta \ "snapshot-log").children.forall(e =>
          (e \ "snapshot-id").extract[Long] !=
            (meta \ "refs" \ "audit" \ "snapshot-id").extract[Long]),
        "a staged branch commit must not enter main's snapshot-log")
    }
  }
}
