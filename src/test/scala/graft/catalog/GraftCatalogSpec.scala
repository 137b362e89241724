package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Named-table catalog: session-catalog binding, SQL-by-name resolution
  * (current snapshot per query), refresh-on-write, warehouse sync,
  * drop/purge. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("create + SQL by bare name; reads follow the current snapshot") {
    val cat = GraftCatalog(spark, tmpDir("cat-basic"))
    cat.createFrom("cat_orders", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(spark.sql("SELECT count(*) AS n FROM cat_orders")
      .as[Long].head() === 2)

    // a write through the catalog is visible to the NEXT SQL read
    cat.append("cat_orders", Seq((3L, "c")).toDF("id", "v"))
    assert(spark.sql("SELECT count(*) AS n FROM cat_orders")
      .as[Long].head() === 3)

    cat.overwrite("cat_orders", Seq((9L, "z")).toDF("id", "v"))
    assert(spark.sql("SELECT v FROM cat_orders").as[String].collect()
      === Array("z"))
    cat.drop("cat_orders")
    assert(!spark.catalog.tableExists("cat_orders"))
  }

  test("schema evolution re-registers: SQL sees the new column") {
    val cat = GraftCatalog(spark, tmpDir("cat-evolve"))
    cat.createFrom("cat_evolve", Seq((1L, "a")).toDF("id", "v"))
    cat.append("cat_evolve", Seq((2L, "b", 7.5)).toDF("id", "v", "score"),
      mergeSchema = true)
    val out = spark.sql(
      "SELECT id, score FROM cat_evolve ORDER BY id").collect()
    assert(out.map(_.getLong(0)) === Array(1L, 2L))
    assert(out(0).isNullAt(1) && out(1).getDouble(1) === 7.5)
    cat.drop("cat_evolve")
  }

  test("sync() re-attaches every table in a warehouse") {
    val wh = tmpDir("cat-sync")
    val writerCat = GraftCatalog(spark, wh)
    writerCat.table("cat_s1").append(Seq((1L, "x")).toDF("id", "v"))
    writerCat.table("cat_s2").append(Seq((2L, "y")).toDF("id", "v"))

    val freshCat = GraftCatalog(spark, wh) // e.g. a new session attaching
    assert(freshCat.sync() === Seq("cat_s1", "cat_s2"))
    assert(spark.sql(
      """SELECT a.v, b.v FROM cat_s1 a JOIN cat_s2 b ON a.id + 1 = b.id""")
      .collect().map(r => (r.getString(0), r.getString(1)))
      === Array(("x", "y")))
    freshCat.drop("cat_s1"); freshCat.drop("cat_s2")
  }

  test("merge through the catalog; SQL reads the upserted state") {
    val cat = GraftCatalog(spark, tmpDir("cat-merge"))
    cat.createFrom("cat_m",
      Seq((1L, "a", "p"), (2L, "b", "p")).toDF("k", "v", "part"))
    cat.merge("cat_m",
      Seq((1L, "a2", "p", 1L), (3L, "c", "p", 1L)).toDF("k", "v", "part", "ts"),
      keys = Seq("k"), dedupKey = Seq("k"), orderCol = "ts")
    assert(spark.sql("SELECT v FROM cat_m ORDER BY k").as[String].collect()
      === Array("a2", "b", "c"))
    cat.drop("cat_m")
  }

  test("durable catalog: a fresh session auto-sees tables, zero register calls") {
    val wh = tmpDir("cat-durable")
    // "session A": create two tables; bindings go to _catalog.json
    val catA = GraftCatalog(spark, wh)
    catA.createFrom("dur_orders", Seq((1L, "o1"), (2L, "o2")).toDF("id", "v"))
    catA.createFrom("dur_items", Seq((1L, 10L)).toDF("id", "qty"))
    assert(new java.io.File(s"$wh/_catalog.json").exists())
    // session death: every in-memory binding is gone
    spark.sql("DROP TABLE IF EXISTS dur_orders")
    spark.sql("DROP TABLE IF EXISTS dur_items")
    assert(!spark.catalog.tableExists("dur_orders"))
    // "session B": constructing the catalog over the warehouse is ALL it
    // does — no register(), no sync(); the durable file re-attaches
    val catB = GraftCatalog(spark, wh)
    assert(catB.listTables === Seq("dur_items", "dur_orders"))
    assert(spark.sql(
      "SELECT o.v, i.qty FROM dur_orders o JOIN dur_items i ON o.id = i.id")
      .collect().map(r => (r.getString(0), r.getLong(1))) === Array(("o1", 10L)))
    catB.drop("dur_orders", purge = true)
    catB.drop("dur_items") // binding dropped, data kept
    val catC = GraftCatalog(spark, wh)
    // purged: fully gone. Unpurged: the warehouse DIRECTORY is still a
    // table (layout is truth for resident tables), so discovery lists it
    // — but it is no longer auto-registered from the durable file
    assert(catC.listTables === Seq("dur_items"))
    assert(!spark.catalog.tableExists("dur_orders"))
  }

  test("attach binds an external-location table durably") {
    val wh = tmpDir("cat-attach-wh")
    val ext = tmpDir("cat-attach-ext") + "/elsewhere"
    graft.table.GraftTable(spark, ext)
      .append(Seq((7L, "far")).toDF("id", "v"))
    val cat = GraftCatalog(spark, wh)
    cat.attach("dur_ext", ext)
    spark.sql("DROP TABLE IF EXISTS dur_ext") // session death
    val catB = GraftCatalog(spark, wh) // fresh session auto-attaches
    assert(catB.path("dur_ext") === ext)
    assert(spark.sql("SELECT v FROM dur_ext").as[String].collect()
      === Array("far"))
    catB.drop("dur_ext")
  }

  test("drop(purge) deletes data; names are validated") {
    val wh = tmpDir("cat-purge")
    val cat = GraftCatalog(spark, wh)
    cat.createFrom("cat_p", Seq((1L, "a")).toDF("id", "v"))
    cat.drop("cat_p", purge = true)
    assert(cat.listTables.isEmpty)
    assert(!new java.io.File(s"$wh/cat_p").exists())
    intercept[IllegalArgumentException](cat.path("../escape"))
    intercept[IllegalArgumentException](cat.path("bad name"))
  }
}
