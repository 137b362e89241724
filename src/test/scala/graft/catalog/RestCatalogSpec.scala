package graft.catalog

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.iceberg.{IcebergExport, IcebergImport, IcebergWriteBack}
import graft.table.GraftTable

/** Iceberg REST catalog client against an IN-PROCESS loopback server —
  * the production resolution seam ((namespace, table) → metadata
  * location) exercised with zero egress. The server speaks the two
  * routes the client needs (`/v1/config`, `loadTable`) straight from
  * the published protocol; the resolved location feeds the existing
  * import path. */
class RestCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** Serve `routes` (path → (status, json)) on an ephemeral loopback
    * port; returns the base URI. */
  private def withServer(routes: Map[String, (Int, String)])
      (body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val (code, json) = routes.getOrElse(ex.getRequestURI.getPath,
        (404, """{"error":{"message":"NoSuchTableException","type":
          |"NoSuchTableException","code":404}}""".stripMargin))
      val bytes = json.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      // empty body → no body at all (Content-Length absent): the JDK
      // client's getErrorStream is then null — the shape the client
      // must survive without masking the status code
      if (bytes.isEmpty) ex.sendResponseHeaders(code, -1)
      else {
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def config(prefix: Option[String]): String = prefix match {
    case Some(p) => s"""{"defaults":{},"overrides":{"prefix":"$p"}}"""
    case None => """{"defaults":{},"overrides":{}}"""
  }

  private def loadTableResult(metadataLocation: String): String =
    s"""{"metadata-location":"$metadataLocation",
       |"metadata":{"format-version":2},"config":{}}""".stripMargin

  test("loadTable through /v1/config prefix splicing resolves " +
      "(namespace, table) to the metadata-location; 404 and " +
      "staged-create (no location) fail loud") {
    withServer(Map(
      "/v1/config" -> ((200, config(Some("warehouses/w1")))),
      "/v1/warehouses/w1/namespaces/bronze/tables/events" ->
        ((200, loadTableResult("/data/tree/metadata/v7.metadata.json"))),
      "/v1/warehouses/w1/namespaces/bronze/tables/staged" ->
        ((200, """{"metadata":{"format-version":2}}"""))
    )) { base =>
      assert(RestCatalog.loadTableMetadataLocation(base, "bronze.events")
        === "/data/tree/metadata/v7.metadata.json")
      val e404 = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "bronze.missing"))
      assert(e404.getMessage.contains("HTTP 404"))
      val eStaged = intercept[IllegalStateException](
        RestCatalog.loadTableMetadataLocation(base, "bronze.staged"))
      assert(eStaged.getMessage.contains("no metadata-location"))
      intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "tablewithoutns"))
    }
  }

  test("an error response with NO body (null error stream) still " +
      "surfaces its HTTP status instead of a masking IOException") {
    withServer(Map(
      "/v1/config" -> ((200, config(None))),
      "/v1/namespaces/bronze/tables/bodyless" -> ((404, ""))
    )) { base =>
      val e = intercept[IllegalArgumentException](
        RestCatalog.loadTableMetadataLocation(base, "bronze.bodyless"))
      assert(e.getMessage.contains("HTTP 404"), e.getMessage)
    }
  }

  test("register_iceberg(catalog_uri =>): the catalog-resolved view " +
      "reads green through the import path, COUNT(*) stays " +
      "metadata-only, the catalog's PINNED metadata version is " +
      "honored over a newer file in the directory, and write-back " +
      "through a metadata-file handle refuses") {
    // a real exported tree with two metadata versions: v1 = 10 rows,
    // v2 (tip) = 15 rows
    val t = GraftTable(spark, tmpDir("restcat") + "/t")
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    IcebergExport.export(spark, t, history = 2)
    val metaDir = new java.io.File(t.location, "metadata")
    // numeric version order — a lexical sort misorders v10+ vs v2
    def metaFiles = metaDir.listFiles
      .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
      .sortBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong).map(_.getPath)
    val v1Meta = metaFiles.last
    IcebergWriteBack.appendTo(spark, t.location,
      (11L to 15L).map(i => (i, s"v$i")).toDF("id", "v"))
    val v2Meta = metaFiles.filterNot(_ == v1Meta).last

    withServer(Map(
      "/v1/config" -> ((200, config(None))),
      // the catalog points the TIP at v2 and a frozen twin at v1 —
      // directory scans would see v2 for both
      "/v1/namespaces/lake/tables/tip" ->
        ((200, loadTableResult(v2Meta))),
      "/v1/namespaces/lake/tables/frozen" ->
        ((200, loadTableResult(v1Meta)))
    )) { base =>
      val tipSnap = spark.sql("CALL graft.register_iceberg('lake.tip', " +
        s"name => 'cat_tip', catalog_uri => '$base')")
        .collect()(0).getLong(0)
      assert(tipSnap > 0L)
      assert(spark.table("cat_tip").select("id").as[Long]
        .collect().sorted === (1L to 15L).toArray)
      // the metadata-only COUNT path composes with catalog resolution
      val cnt = spark.sql("SELECT COUNT(*) AS n FROM cat_tip")
      assert(cnt.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      assert(cnt.collect()(0).getLong(0) === 15L)

      // the FROZEN handle pins the catalog's version, not the
      // directory's newest file
      spark.sql("CALL graft.register_iceberg('lake.frozen', " +
        s"name => 'cat_frozen', catalog_uri => '$base')")
      assert(spark.table("cat_frozen").count() === 10L)

      // a metadata-file handle is read-only: write-back refuses
      val e = intercept[IllegalArgumentException](
        IcebergWriteBack.appendTo(spark, v2Meta,
          Seq((99L, "x")).toDF("id", "v")))
      assert(e.getMessage.contains("table root"))
      Seq("cat_tip", "cat_frozen").foreach(spark.catalog.dropTempView)

      // import_iceberg through the catalog: the resolved source
      // materializes into a graft table
      val dest = tmpDir("restcat-dest") + "/t"
      spark.sql(s"CALL graft.import_iceberg('$dest', " +
        s"source => 'lake.tip', catalog_uri => '$base')")
      assert(GraftTable(spark, dest).read().count() === 15L)

      // catalog_uri composes with at => : time travel WITHIN the
      // catalog-resolved metadata (the v2 handle knows both snapshots).
      // One step back from the tip = the 10-row pre-write-back state —
      // the export also carries the table's initial EMPTY snapshot, so
      // "lowest sequence number" would pick 0 rows
      val tip = IcebergImport.currentSnapshotId(spark, t.location).get
      val oldSnap = IcebergImport.snapshots(spark, t.location)
        .filter(col("snapshot_id") === tip)
        .select("parent_id").as[Long].collect()(0)
      spark.sql("CALL graft.register_iceberg('lake.tip', " +
        s"name => 'cat_tt', catalog_uri => '$base', at => '$oldSnap')")
      assert(spark.table("cat_tt").count() === 10L)
      spark.catalog.dropTempView("cat_tt")
    }
  }
}
