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
    // numeric version order — a lexical sort misorders v10+ vs v2
    new File(t.location, "metadata").listFiles()
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .maxBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong)
      .getAbsolutePath

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

  test("self-maintaining catalog sink: maintainEvery triggers compact " +
      "+ manifest/tombstone consolidation THROUGH the catalog, so the " +
      "manifest list stays BOUNDED instead of one entry per " +
      "micro-batch; content and exactly-once stamps unaffected") {
    val t = freshTree("ccommit-selfmaint")
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      val raw = tmpDir("ccommit-selfmaint-raw")
      (11L to 22L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartition(12).write.mode("append").parquet(raw)
      val stream = spark.readStream
        .schema(spark.read.parquet(raw).schema)
        .option("maxFilesPerTrigger", 1).parquet(raw)
      val q = graft.streaming.Streaming.icebergCatalogSink(stream,
        base, "lake.t", "selfmaint-app", maintainEvery = 4)
        .option("checkpointLocation", tmpDir("ccommit-selfmaint-ckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      // all rows landed exactly once
      assert(IcebergImport.read(spark, loc).select("id").as[Long]
        .collect().sorted === (1L to 22L).toArray)
      // ~12 appends happened, but maintenance consolidated: the live
      // manifest list is well under one entry per commit, and the live
      // data-file count is bounded too (compaction binpacked)
      val mCount = IcebergImport.manifests(spark, loc).count()
      assert(mCount <= 6,
        s"manifest list not bounded by sink maintenance: $mCount")
      val fCount = IcebergImport.plan(spark, loc).files.size
      assert(fCount <= 6,
        s"data files not bounded by sink maintenance: $fCount")
      // maintenance actually COMMITTED (replace snapshots in history —
      // it creates history, never rewrites it)
      val ops = IcebergImport.snapshots(spark, loc)
        .select("operation").as[String].collect()
      assert(ops.count(_ == "replace") >= 2,
        s"expected maintenance replace commits, ops=${ops.toSeq}")
      assert(ops.count(_ == "append") >= 10)
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

  test("catalog-first CREATE TABLE: namespace + table created through " +
      "the protocol, the catalog owns the initial metadata (no " +
      "snapshot — reads as zero rows of the declared schema), the " +
      "first append commits against the null-form main assert, " +
      "duplicate creates 409 / if-not-exists no-op — the reference's " +
      "E1 create-if-not-exists bronze shape end-to-end") {
    import org.apache.spark.sql.types.StructType
    val wh = tmpDir("ccommit-create-wh")
    val t = freshTree("ccommit-create")
    val cat = new graft.tools.LoopbackIcebergCatalog("lake.t",
      latestMeta(t), warehouse = Some(wh))
    val base = cat.start()
    try {
      // namespace lifecycle: create, duplicate 409, if-not-exists
      // no-op, listing
      assert(RestCatalog.createNamespace(base, "bronze"))
      val eDup = intercept[IllegalArgumentException](
        RestCatalog.createNamespace(base, "bronze"))
      assert(eDup.getMessage.contains("HTTP 409"), eDup.getMessage)
      assert(!RestCatalog.createNamespace(base, "bronze",
        ifNotExists = true))
      assert(RestCatalog.listNamespaces(base).contains("bronze"))

      // catalog-first create — no location: the server's warehouse
      // default places the table
      val loc0 = IcebergExport.createTableCatalog(spark, base,
        "bronze.events", StructType.fromDDL("id bigint, v string"))
      assert(loc0.endsWith("-rest.metadata.json"))
      // a created-but-never-written table reads as ZERO rows of its
      // declared schema through the catalog handle
      val df0 = IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "bronze.events"))
      assert(df0.count() === 0L)
      assert(df0.columns === Array("id", "v"))
      // duplicate create 409s; if-not-exists returns the EXISTING
      // handle instead
      val eTab = intercept[IllegalArgumentException](
        IcebergExport.createTableCatalog(spark, base, "bronze.events",
          StructType.fromDDL("id bigint, v string")))
      assert(eTab.getMessage.contains("HTTP 409"), eTab.getMessage)
      assert(IcebergExport.createTableCatalog(spark, base,
        "bronze.events", StructType.fromDDL("id bigint, v string"),
        ifNotExists = true) === loc0)
      assert(RestCatalog.listTables(base, "bronze") ===
        Seq("bronze.events"))

      // FIRST append: no parent, null-form main assert; chained second
      val s1 = IcebergWriteBack.appendToCatalog(spark, base,
        "bronze.events", (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"))
      assert(s1 > 0)
      IcebergWriteBack.appendToCatalog(spark, base, "bronze.events",
        Seq((6L, "v6")).toDF("id", "v"))
      def readIds: Array[Long] = IcebergImport.read(spark, RestCatalog
        .loadTableMetadataLocation(base, "bronze.events"))
        .select("id").as[Long].collect().sorted
      assert(readIds === (1L to 6L).toArray)
      // the first snapshot has NO parent-snapshot-id (spec shape)
      val meta = parse(new String(Files.readAllBytes(new File(
        RestCatalog.loadTableMetadataLocation(base, "bronze.events"))
        .toPath), StandardCharsets.UTF_8))
      val firstSnap = (meta \ "snapshots").children.find(s =>
        (s \ "snapshot-id").extract[Long] == s1).get
      assert((firstSnap \ "parent-snapshot-id") === JNothing)

      // the whole E1 shape on the SQL surface: create-if-not-exists
      // (no-op here) + append through the catalog
      spark.sql("CALL graft.create_iceberg('bronze.events', " +
        "schema => 'id bigint, v string', " +
        s"catalog_uri => '$base', if_not_exists => 'true')")
      Seq((7L, "v7")).toDF("id", "v").createOrReplaceTempView("e1_src")
      spark.sql("CALL graft.append_iceberg('bronze.events', " +
        s"source => 'e1_src', catalog_uri => '$base')")
      assert(readIds === (1L to 7L).toArray)
      spark.catalog.dropTempView("e1_src")

      // external evidence: the DuckDB hand-walker reads the
      // catalog-created table through its exact handle
      val handle = RestCatalog
        .loadTableMetadataLocation(base, "bronze.events")
      val out = scala.sys.process.Process(Seq("python3",
        "tools/read_iceberg_duckdb.py", handle,
        "SELECT COUNT(*) AS n FROM t")).!!
      assert(out.trim.split("\n").last === "7")
    } finally cat.stop()
  }

  test("catalog-first CREATE with hidden partitioning: the declared " +
      "transform spec rides the CreateTableRequest, and the first " +
      "append lays files out under it (partition pruning works on a " +
      "table that never existed filesystem-first)") {
    import org.apache.spark.sql.types.StructType
    val wh = tmpDir("ccommit-createp-wh")
    val t = freshTree("ccommit-createp")
    val cat = new graft.tools.LoopbackIcebergCatalog("lake.t",
      latestMeta(t), warehouse = Some(wh))
    val base = cat.start()
    try {
      RestCatalog.createNamespace(base, "silver")
      IcebergExport.createTableCatalog(spark, base, "silver.b",
        StructType.fromDDL("id bigint, v string"),
        partitionBy = Seq("bucket(4, id)"))
      IcebergWriteBack.appendToCatalog(spark, base, "silver.b",
        (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"))
      def handle: String = RestCatalog
        .loadTableMetadataLocation(base, "silver.b")
      assert(IcebergImport.read(spark, handle).count() === 40L)
      // the layout IS partitioned: one file per populated bucket
      val files = IcebergImport.plan(spark, handle).files
      assert(files.size >= 2,
        s"expected a partitioned layout, got ${files.size} file(s)")
      // the declared spec landed in catalog-owned metadata
      val meta = parse(new String(Files.readAllBytes(
        new File(handle).toPath), StandardCharsets.UTF_8))
      val spec = (meta \ "partition-specs").children.head
      assert(((spec \ "fields").children.head \ "transform")
        .extract[String] === "bucket[4]")
    } finally cat.stop()
  }

  test("v3 commits VERIFY the catalog honored the row-lineage " +
      "contract: a server that applies add-snapshot without advancing " +
      "next-row-id fails the commit loud instead of letting the next " +
      "committer assign overlapping row ids") {
    val t = freshTree("ccommit-v3contract")
    IcebergWriteBack.upgradeFormatVersion(spark, t.location, 3)
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((11L, "a")).toDF("id", "v"))
    val handle = latestMeta(t)
    // a NON-COMPLIANT catalog: accepts every commit but echoes the
    // ORIGINAL metadata back (next-row-id never advances)
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val meta = parse(new String(Files.readAllBytes(
        new File(handle).toPath), StandardCharsets.UTF_8))
      val body =
        if (ex.getRequestURI.getPath == "/v1/config")
          """{"defaults":{},"overrides":{}}"""
        else compact(render(
          ("metadata-location" -> handle) ~ ("metadata" -> meta)))
      if (ex.getRequestMethod == "POST")
        ex.getRequestBody.readAllBytes()
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val e = intercept[IllegalArgumentException] {
        IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
          Seq((12L, "b")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("did not advance next-row-id"),
        e.getMessage)
    } finally server.stop(0)
  }

  test("a metadata file that OMITS current-snapshot-id while carrying " +
      "snapshots keeps failing loud on read — only an explicit -1 " +
      "with an empty snapshot list reads as an empty table") {
    val t = freshTree("ccommit-omitcur")
    implicit val fmts: Formats = DefaultFormats
    val metaPath = new File(latestMeta(t)).toPath
    val meta = parse(new String(Files.readAllBytes(metaPath),
      StandardCharsets.UTF_8))
    val stripped = JObject(meta.asInstanceOf[JObject].obj
      .filterNot(_._1 == "current-snapshot-id"))
    val dir = tmpDir("ccommit-omitcur-meta")
    val f = new File(dir, "v99.metadata.json")
    Files.write(f.toPath, compact(render(stripped))
      .getBytes(StandardCharsets.UTF_8))
    val e = intercept[IllegalStateException](
      IcebergImport.read(spark, f.getAbsolutePath).count())
    assert(e.getMessage.contains("no current snapshot"), e.getMessage)
  }

  test("catalog CRUD completion: rename moves only the name binding " +
      "(history + data intact, old name 404s, destination collisions " +
      "409); drop forgets the binding without purging files; an " +
      "empty namespace drops, a non-empty one 409s") {
    import org.apache.spark.sql.types.StructType
    val wh = tmpDir("ccommit-crud-wh")
    val t = freshTree("ccommit-crud")
    val cat = new graft.tools.LoopbackIcebergCatalog("lake.t",
      latestMeta(t), warehouse = Some(wh))
    val base = cat.start()
    try {
      RestCatalog.createNamespace(base, "stage")
      IcebergExport.createTableCatalog(spark, base, "stage.a",
        StructType.fromDDL("id bigint, v string"))
      IcebergWriteBack.appendToCatalog(spark, base, "stage.a",
        (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"))
      val handleBefore = RestCatalog
        .loadTableMetadataLocation(base, "stage.a")

      // destination collision 409s; missing source 404s
      val eDup = intercept[IllegalStateException](
        RestCatalog.renameTable(base, "stage.a", "lake.t"))
      assert(eDup.getMessage.contains("409"), eDup.getMessage)
      val eMiss = intercept[IllegalArgumentException](
        RestCatalog.renameTable(base, "stage.ghost", "stage.b"))
      assert(eMiss.getMessage.contains("404"), eMiss.getMessage)

      // rename via SQL: binding moves, metadata handle identical
      spark.sql("CALL graft.rename_iceberg('stage.a', " +
        s"to => 'stage.b', catalog_uri => '$base')")
      val e404 = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "stage.a"))
      assert(e404.getMessage.contains("HTTP 404"))
      assert(RestCatalog.loadTableMetadataLocation(base, "stage.b")
        === handleBefore)
      assert(IcebergImport.read(spark, handleBefore).count() === 5L)
      // commits keep working under the new name
      IcebergWriteBack.appendToCatalog(spark, base, "stage.b",
        Seq((6L, "v6")).toDF("id", "v"))
      assert(IcebergImport.read(spark, RestCatalog
        .loadTableMetadataLocation(base, "stage.b")).count() === 6L)

      // namespace with a table refuses to drop
      val eNs = intercept[IllegalStateException](
        RestCatalog.dropNamespace(base, "stage"))
      assert(eNs.getMessage.contains("409"), eNs.getMessage)

      // drop: binding gone (404), files NOT purged (the dropped
      // handle still reads — shared-tree contract)
      val finalHandle = RestCatalog
        .loadTableMetadataLocation(base, "stage.b")
      assert(spark.sql("CALL graft.drop_iceberg('stage.b', " +
        s"catalog_uri => '$base')").collect()(0).getLong(0) === 1L)
      intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "stage.b"))
      assert(IcebergImport.read(spark, finalHandle).count() === 6L)
      // if_exists absorbs the 404
      assert(spark.sql("CALL graft.drop_iceberg('stage.b', " +
        s"catalog_uri => '$base', if_exists => 'true')")
        .collect()(0).getLong(0) === 0L)
      // now-empty namespace drops
      assert(RestCatalog.dropNamespace(base, "stage"))
      assert(!RestCatalog.listNamespaces(base).contains("stage"))
    } finally cat.stop()
  }

  test("catalog-owned maintenance: rewrite_manifests, rewrite_position_" +
      "deletes and compact commit their replace snapshots THROUGH the " +
      "catalog (SQL surface); content is byte-identical before/after; " +
      "manifest/file/tombstone counts actually shrink") {
    val t = freshTree("ccommit-maint")
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      // accrete exactly what a per-micro-batch catalog sink accretes:
      // one small file + manifest per append, one delete manifest per
      // delete commit
      for (i <- 0 until 3)
        IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
          Seq((100L + i, s"x$i")).toDF("id", "v"))
      IcebergWriteBack.deleteWhereCatalog(spark, base, "lake.t",
        col("id") === 101L)
      IcebergWriteBack.deleteWhereCatalog(spark, base, "lake.t",
        col("id") === 102L)
      def loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      def rows = IcebergImport.read(spark, loc)
        .select("id").as[Long].collect().sorted
      val before = rows
      assert(before === ((1L to 10L) :+ 100L).toArray)

      val mCountBefore = IcebergImport.manifests(spark, loc).count()
      spark.sql("CALL graft.rewrite_manifests_iceberg('lake.t', " +
        s"catalog_uri => '$base', min_input_manifests => 2)")
      assert(rows === before)
      assert(IcebergImport.manifests(spark, loc).count() < mCountBefore)

      val delFilesBefore = IcebergImport.plan(spark, loc).deletes.size
      assert(delFilesBefore >= 2)
      spark.sql("CALL graft.rewrite_position_deletes_iceberg(" +
        s"'lake.t', catalog_uri => '$base')")
      assert(rows === before)
      assert(IcebergImport.plan(spark, loc).deletes.size <
        delFilesBefore)

      val dataFilesBefore = IcebergImport.plan(spark, loc).files.size
      spark.sql("CALL graft.compact_iceberg('lake.t', " +
        s"catalog_uri => '$base', min_input_files => 2)")
      assert(rows === before)
      assert(IcebergImport.plan(spark, loc).files.size < dataFilesBefore)
      // time travel to the pre-maintenance snapshots still works — the
      // replace commits created history, never rewrote it
      assert(IcebergImport.snapshots(spark, loc).count() >= 8)
    }
  }

  test("catalog-owned maintenance hits the same stale-assert 409 wall " +
      "as any commit: a compaction planned against a superseded " +
      "metadata handle is refused, never applied") {
    val t = freshTree("ccommit-maint409")
    withCatalog("lake.t", latestMeta(t)) { (base, _) =>
      for (i <- 0 until 2)
        IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
          Seq((200L + i, s"y$i")).toDF("id", "v"))
      // resolve a handle, then move the head through the catalog
      val staleHandle = RestCatalog
        .loadTableMetadataLocation(base, "lake.t")
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((299L, "z")).toDF("id", "v"))
      val e = intercept[IllegalStateException] {
        IcebergWriteBack.compactSmallFiles(spark, staleHandle,
          minInputFiles = 2, catalog = Some((base, "lake.t")))
      }
      assert(e.getMessage.contains("409"), e.getMessage)
      // nothing landed; a fresh-handle retry succeeds
      val fresh = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      val n = IcebergImport.plan(spark, fresh).files.size
      IcebergWriteBack.compactSmallFiles(spark, fresh,
        minInputFiles = 2, catalog = Some((base, "lake.t")))
      assert(IcebergImport.plan(spark, RestCatalog
        .loadTableMetadataLocation(base, "lake.t")).files.size < n)
    }
  }

  test("expire race: a ref created AFTER the expiry loaded its state, " +
      "targeting a to-be-dropped snapshot, 409s the remove-snapshots " +
      "— the catalog never ends up with a ref at a removed snapshot") {
    val t = freshTree("ccommit-exprace")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      val s1 = IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((11L, "x")).toDF("id", "v"))
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((12L, "y")).toDF("id", "v"))
      // interposing proxy: GETs pass through; the FIRST POST (the
      // expiry's remove-snapshots) is preceded by a concurrent tag
      // create at s1 — exactly the race the load-time ref asserts
      // cannot see, caught by the catalog's server-side validation
      val injected = new java.util.concurrent.atomic.AtomicBoolean(false)
      val proxy = HttpServer.create(
        new InetSocketAddress("127.0.0.1", 0), 0)
      proxy.createContext("/", (ex: HttpExchange) => {
        val (code, body) =
          if (ex.getRequestMethod == "POST") {
            if (injected.compareAndSet(false, true)) {
              val (c, _) = cat.commit(compact(render(
                ("requirements" -> JArray(Nil)) ~
                  ("updates" -> JArray(List(
                    (("action" -> "set-snapshot-ref") ~
                      ("ref-name" -> "late-pin") ~ ("type" -> "tag") ~
                      ("snapshot-id" -> s1)): JValue))))))
              assert(c === 200)
            }
            cat.commit(new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8))
          } else if (ex.getRequestURI.getPath == "/v1/config")
            (200, """{"defaults":{},"overrides":{}}""")
          else (200, compact(render(
            ("metadata-location" -> cat.location): JObject)))
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
      proxy.start()
      val pBase = s"http://127.0.0.1:${proxy.getAddress.getPort}"
      try {
        val e = intercept[IllegalStateException] {
          IcebergWriteBack.expireSnapshots(spark,
            RestCatalog.loadTableMetadataLocation(pBase, "lake.t"),
            keepLast = 1, catalog = Some((pBase, "lake.t")))
        }
        assert(e.getMessage.contains("409"), e.getMessage)
      } finally proxy.stop(0)
      // nothing was removed: the late tag resolves and reads
      assert(IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.t"),
        Some("late-pin")).count() === 11L)
      // a RETRY that loads the post-race state keeps the tag's target
      // and succeeds
      val dropped = IcebergWriteBack.expireSnapshots(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.t"),
        keepLast = 1, catalog = Some((base, "lake.t")))
      assert(dropped >= 1)
      assert(IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.t"),
        Some("late-pin")).count() === 11L)
    }
  }

  test("bearer-token seam: a token-protected catalog 401s anonymous " +
      "clients; a registered token authorizes resolution and commits " +
      "(header-only, zero egress)") {
    val t = freshTree("ccommit-auth")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      cat.requiredToken = Some("sekret")
      val e = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "lake.t"))
      assert(e.getMessage.contains("HTTP 401"), e.getMessage)
      RestCatalog.setBearerToken(base, Some("sekret"))
      try {
        val s = IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
          Seq((42L, "z")).toDF("id", "v"))
        assert(s > 0)
        assert(IcebergImport.read(spark,
          RestCatalog.loadTableMetadataLocation(base, "lake.t"))
          .count() === 11L)
      } finally RestCatalog.setBearerToken(base, None)
      // token cleared → anonymous again → 401
      val e2 = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "lake.t"))
      assert(e2.getMessage.contains("HTTP 401"), e2.getMessage)
    }
  }

  test("OAuth2 client-credentials: tokens mint lazily from the spec's " +
      "/v1/oauth/tokens endpoint, authorize resolution and commits, " +
      "and a server-side EXPIRY mid-session refreshes transparently " +
      "(one retry) — wrong credentials fail loud; zero egress") {
    val t = freshTree("ccommit-oauth")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      cat.oauthClient = Some(("svc-graft", "s3cr3t"))
      // anonymous → 401 (no token, no credentials registered)
      val e = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "lake.t"))
      assert(e.getMessage.contains("HTTP 401"), e.getMessage)
      // wrong secret: the token ENDPOINT rejects — loud, names the base
      RestCatalog.setOAuthCredentials(base, "svc-graft", "wrong")
      val e2 = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "lake.t"))
      assert(e2.getMessage.contains("OAuth token request") &&
        e2.getMessage.contains("401"), e2.getMessage)
      RestCatalog.clearOAuthCredentials(base)
      // right credentials: resolution AND a catalog commit work; the
      // token minted ONCE and cached across requests
      RestCatalog.setOAuthCredentials(base, "svc-graft", "s3cr3t",
        scope = Some("catalog"))
      try {
        assert(RestCatalog.loadTableMetadataLocation(base, "lake.t")
          .nonEmpty)
        val s = IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
          Seq((42L, "z")).toDF("id", "v"))
        assert(s > 0)
        assert(cat.tokensIssued === 1,
          "token must mint once and be cached, not per-request")
        // server-side expiry: the next request 401s, the client drops
        // its cache, refreshes ONCE and the request succeeds
        cat.expireTokens()
        assert(IcebergImport.read(spark,
          RestCatalog.loadTableMetadataLocation(base, "lake.t"))
          .count() === 11L)
        assert(cat.tokensIssued === 2,
          "the 401 must trigger exactly one refresh")
      } finally RestCatalog.clearOAuthCredentials(base)
      // credentials cleared → anonymous again → 401
      val e3 = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "lake.t"))
      assert(e3.getMessage.contains("HTTP 401"), e3.getMessage)
    }
  }

  test("commitTransaction: ATOMIC multi-table commits — both tables " +
      "move together; a stale requirement on ONE member 409s the " +
      "whole transaction and NO table moves") {
    import org.json4s._
    import org.json4s.JsonDSL._
    val t = freshTree("ccommit-txn")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      // second catalog-owned table, created catalog-first + seeded
      RestCatalog.createTable(base, "lake.u",
        org.json4s.jackson.JsonMethods.parse(
          """{"type":"struct","schema-id":0,"fields":[
            |{"id":1,"name":"id","required":false,"type":"long"},
            |{"id":2,"name":"v","required":false,"type":"string"}]}"""
            .stripMargin),
        location = Some(tmpDir("ccommit-txn-u")))
      IcebergWriteBack.appendToCatalog(spark, base, "lake.u",
        Seq((100L, "u0")).toDF("id", "v"))
      val countT = IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.t")).count()

      // happy path: one transaction appends to BOTH tables
      val ids = IcebergWriteBack.appendToCatalogAtomic(spark, base, Seq(
        "lake.t" -> Seq((500L, "tx")).toDF("id", "v"),
        "lake.u" -> Seq((501L, "ux")).toDF("id", "v")))
      assert(ids.size === 2 && ids.forall(_ > 0))
      assert(IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.t"))
        .count() === countT + 1)
      assert(IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "lake.u"))
        .count() === 2L)

      // rollback: member A's requirement is CURRENT, member B's is
      // STALE — the transaction must 409 and A must NOT move
      implicit val fmts: Formats = DefaultFormats
      def curId(ident: String): Long = {
        val loc = RestCatalog.loadTableMetadataLocation(base, ident)
        (org.json4s.jackson.JsonMethods.parse(new String(
          java.nio.file.Files.readAllBytes(
            new java.io.File(loc).toPath),
          java.nio.charset.StandardCharsets.UTF_8)) \
          "current-snapshot-id").extract[Long]
      }
      def assertRef(id: Long): JValue =
        ("type" -> "assert-ref-snapshot-id") ~ ("ref" -> "main") ~
          ("snapshot-id" -> id)
      def setRef(id: Long): JValue =
        ("action" -> "set-snapshot-ref") ~ ("ref-name" -> "main") ~
          ("type" -> "branch") ~ ("snapshot-id" -> id)
      val locT0 = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      val locU0 = RestCatalog.loadTableMetadataLocation(base, "lake.u")
      val e = intercept[IllegalStateException](
        RestCatalog.commitTransaction(base, Seq(
          ("lake.t", Seq(assertRef(curId("lake.t"))),
            Seq(setRef(curId("lake.t")))),
          ("lake.u", Seq(assertRef(-999L)),
            Seq(setRef(curId("lake.u")))))))
      assert(e.getMessage.contains("409") &&
        e.getMessage.contains("NO table moved"), e.getMessage)
      assert(RestCatalog.loadTableMetadataLocation(base, "lake.t")
        === locT0, "member A moved despite the aborted transaction")
      assert(RestCatalog.loadTableMetadataLocation(base, "lake.u")
        === locU0)

      // unknown member: loud, nothing moves
      val e2 = intercept[IllegalArgumentException](
        RestCatalog.commitTransaction(base, Seq(
          ("lake.nope", Seq(assertRef(1L)), Seq(setRef(1L))))))
      assert(e2.getMessage.contains("404"), e2.getMessage)

      // DUPLICATE member (same table twice): both could pass the
      // pre-check against one pre-state but the second would fail
      // mid-apply — the server refuses up front, nothing moves
      val locT1 = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      val idT = curId("lake.t")
      val e3 = intercept[Exception](
        RestCatalog.commitTransaction(base, Seq(
          ("lake.t", Seq(assertRef(idT)), Seq(setRef(idT))),
          ("lake.t", Seq(assertRef(idT)), Seq(setRef(idT))))))
      assert(e3.getMessage.contains("duplicate"), e3.getMessage)
      assert(RestCatalog.loadTableMetadataLocation(base, "lake.t")
        === locT1, "table moved despite the refused duplicate txn")
    }
  }

  test("pagination: list routes drain every page via next-page-token " +
      "(a one-page client silently undercounts a paginated catalog)") {
    val t = freshTree("ccommit-page")
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      (1 to 5).foreach(i =>
        RestCatalog.createNamespace(base, s"ns$i"))
      (1 to 5).foreach(i =>
        RestCatalog.createTable(base, s"ns1.t$i",
          org.json4s.jackson.JsonMethods.parse(
            """{"type":"struct","schema-id":0,"fields":[
              |{"id":1,"name":"id","required":false,"type":"long"}]}"""
              .stripMargin),
          location = Some(tmpDir(s"ccommit-page-t$i"))))
      cat.pageSize = Some(2) // 6 namespaces / 5 tables → 3 pages each
      assert(RestCatalog.listNamespaces(base).toSet ===
        (Set("lake") ++ (1 to 5).map(i => s"ns$i")))
      assert(RestCatalog.listTables(base, "ns1").sorted ===
        (1 to 5).map(i => s"ns1.t$i"))
      cat.pageSize = None
    }
  }

  test("v3 catalog commits: the snapshot's first-row-id/added-rows " +
      "advance the CATALOG's next-row-id (the spec's row-lineage " +
      "contract); lineage is continuous across catalog commits; a DV " +
      "delete consumes no row-id space; a STALE first-row-id 409s") {
    val t = freshTree("ccommit-v3")
    IcebergWriteBack.upgradeFormatVersion(spark, t.location, 3)
    // establish lineage filesystem-side (next-row-id becomes > 0)
    IcebergWriteBack.appendTo(spark, t.location,
      Seq((11L, "a")).toDF("id", "v"))
    withCatalog("lake.t", latestMeta(t)) { (base, cat) =>
      def catMeta: JValue = parse(new String(Files.readAllBytes(
        new File(cat.location).toPath), StandardCharsets.UTF_8))
      def nextRowId: Long = (catMeta \ "next-row-id").extract[Long]
      val rid0 = nextRowId
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        (12L to 14L).map(i => (i, s"v$i")).toDF("id", "v"))
      assert(nextRowId === rid0 + 3)
      // the committed snapshot entry carries both lineage fields
      val snap = (catMeta \ "snapshots").children.last
      assert((snap \ "first-row-id").extract[Long] === rid0)
      assert((snap \ "added-rows").extract[Long] === 3L)
      // a second commit chains on catalog-advanced lineage state
      IcebergWriteBack.appendToCatalog(spark, base, "lake.t",
        Seq((15L, "e")).toDF("id", "v"))
      assert(nextRowId === rid0 + 4)
      // landed rows read back with CONTINUOUS row ids through the
      // catalog's metadata handle
      val loc = RestCatalog.loadTableMetadataLocation(base, "lake.t")
      val allFiles = IcebergImport.plan(spark, loc).files.map(_.uri).toSet
      val rids = IcebergImport
        .readFileSubsetRowLineage(spark, loc, allFiles)
        .filter(col("id").between(12L, 15L))
        .select("_row_id").as[Long].collect().sorted
      assert(rids === Array(rid0, rid0 + 1, rid0 + 2, rid0 + 3))
      // a v3 DV delete through the catalog: rows leave, but no row-id
      // space is consumed (existing rows keep their ids)
      IcebergWriteBack.deleteWhereCatalog(spark, base, "lake.t",
        col("id") === 13L)
      assert(IcebergImport.read(spark, RestCatalog
        .loadTableMetadataLocation(base, "lake.t")).count() === 14L)
      assert(nextRowId === rid0 + 4)
      // STALE first-row-id (a concurrent commit consumed row-id space
      // after this client loaded): the catalog MUST reject — accepting
      // would assign overlapping row ids
      val curHead = (catMeta \ "current-snapshot-id").extract[Long]
      val e = intercept[IllegalStateException] {
        RestCatalog.commitTable(base, "lake.t",
          requirements = Seq((("type" -> "assert-ref-snapshot-id") ~
            ("ref" -> "main") ~ ("snapshot-id" -> curHead)): JValue),
          updates = Seq((("action" -> "add-snapshot") ~
            ("snapshot" -> ((("snapshot-id" -> 424242L) ~
              ("sequence-number" -> 999L) ~
              ("timestamp-ms" -> 1L) ~
              ("first-row-id" -> (rid0 - 1)) ~
              ("added-rows" -> 1L)): JValue))): JValue))
      }
      assert(e.getMessage.contains("409"), e.getMessage)
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

  test("catalog-first create with a NESTED schema: last-column-id " +
      "covers nested/slot ids; catalog appends round-trip collections") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val wh = tmpDir("ccommit-nested-wh")
    val t = freshTree("ccommit-nested")
    val cat = new graft.tools.LoopbackIcebergCatalog("lake.t",
      latestMeta(t), warehouse = Some(wh))
    val base = cat.start()
    try {
      RestCatalog.createNamespace(base, "bronze")
      val schema = StructType.fromDDL(
        "id bigint, xs array<bigint>, st struct<a: bigint, b: string>")
      IcebergExport.createTableCatalog(spark, base, "bronze.nested",
        schema)
      val metaLoc = RestCatalog.loadTableMetadataLocation(base,
        "bronze.nested")
      val meta = parse(new String(Files.readAllBytes(
        new File(metaLoc).toPath), StandardCharsets.UTF_8))
      // 3 top-level + list element + 2 struct leaves = 6 ids, all
      // covered by last-column-id (a real catalog computes the same)
      assert((meta \ "last-column-id").extract[Int] === 6)
      val fields = ((meta \ "schemas").children.head \ "fields").children
      val xsT = fields.find(f =>
        (f \ "name").extract[String] == "xs").get \ "type"
      assert((xsT \ "element-id").extractOpt[Int].nonEmpty)
      val stLeaves = (fields.find(f =>
        (f \ "name").extract[String] == "st").get \ "type" \ "fields")
        .children
      assert(stLeaves.size === 2 &&
        stLeaves.forall(f => (f \ "id").extractOpt[Int].nonEmpty))
      // append nested rows through the catalog and read them back
      val df = spark.createDataFrame(Seq(
        org.apache.spark.sql.Row(1L, Seq(1L, 2L),
          org.apache.spark.sql.Row(10L, "x")),
        org.apache.spark.sql.Row(2L, Seq(3L, 4L),
          org.apache.spark.sql.Row(20L, "y"))).asJava,
        StructType(Seq(
          StructField("id", LongType),
          StructField("xs", ArrayType(LongType)),
          StructField("st", StructType(Seq(
            StructField("a", LongType), StructField("b", StringType)))))))
      IcebergWriteBack.appendToCatalog(spark, base, "bronze.nested", df)
      val got = IcebergImport.read(spark,
        RestCatalog.loadTableMetadataLocation(base, "bronze.nested"))
        .select(col("id"), element_at(col("xs"), 2).as("x2"),
          col("st.b").as("b"))
        .as[(Long, Long, String)].collect().sortBy(_._1)
      assert(got.toSeq === Seq((1L, 2L, "x"), (2L, 4L, "y")))
    } finally cat.stop()
  }
}
