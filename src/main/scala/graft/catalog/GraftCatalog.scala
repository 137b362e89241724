package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.table.GraftTable

/** Named-table catalog over a warehouse directory.
  *
  * The reference addresses every table through a catalog name
  * (`dev.icebergdb.bronze_orders` via the Glue catalog,
  * /root/reference/raw-bronze.py:104-109,200-202;
  * `spark.catalog.tableExists` at raw-bronze.py:178; consumers query by
  * bare name, /root/reference/query-engine/starocks/mask.sql). graft's
  * equivalent: table `name` lives at `<warehouse>/<name>`, and
  * [[register]] binds the name into Spark's session catalog as a
  * `USING graft` datasource table — after that, plain
  * `spark.sql("SELECT ... FROM name")` resolves the CURRENT snapshot
  * through the graft data source on every (uncached) plan, with the same
  * FileIndex pruning as the path API.
  *
  * The name→path mapping is DURABLE: `_catalog.json` in the warehouse
  * root records every binding (including [[attach]]ed tables living
  * outside the warehouse), updated by atomic tmp-write + rename on
  * create/attach/drop. Constructing a GraftCatalog over a warehouse
  * AUTO-REGISTERS everything the file records — a fresh session sees
  * all tables with zero per-session `register` calls, the recovery
  * property the reference gets from the Glue metastore
  * (/root/reference/raw-bronze.py:104-109). Warehouses predating the
  * file still re-attach via [[sync]]'s directory listing (a `_graft`
  * subdirectory IS a table), and sync backfills the file. Concurrent
  * same-warehouse catalog mutations are last-writer-wins on the JSON —
  * the table DATA commit protocol is unaffected; a production
  * deployment swaps this file for a shared metastore, changing nothing
  * in the table format.
  *
  * Writes routed through the catalog ([[append]]/[[overwrite]]/[[merge]])
  * refresh Spark's relation cache and re-register on schema evolution, so
  * SQL readers never see a stale schema or file list.
  */
class GraftCatalog(spark: SparkSession, val warehouse: String) {

  // auto-reattach: bind every durable catalog entry into this session
  catalogFile.load().foreach { case (name, loc) =>
    if (GraftTable(spark, loc).exists) registerPath(name, loc)
  }

  private def catalogFile = new CatalogFile(spark, warehouse)

  /** filesystem location of table `name` — the durable binding if one
    * exists (attached tables live outside the warehouse), else the
    * warehouse-layout default `<warehouse>/<name>`. */
  def path(name: String): String =
    catalogFile.load().getOrElse(validated(name),
      s"$warehouse/${validated(name)}")

  /** path-level handle (all GraftTable operations). */
  def table(name: String): GraftTable = GraftTable(spark, path(name))

  def exists(name: String): Boolean = table(name).exists

  private def validated(name: String): String = {
    require(name.matches("[A-Za-z0-9_]+"),
      s"invalid graft table name: $name")
    name
  }

  /** Bind `name` into the session catalog (re-binding: an earlier binding
    * may point at another warehouse) AND into the durable `_catalog.json`.
    * The session binding is an EXTERNAL datasource table — dropping it
    * never deletes data. */
  def register(name: String): Unit = {
    require(exists(name), s"no graft table named $name in $warehouse")
    val loc = path(name)
    registerPath(name, loc)
    catalogFile.put(validated(name), loc)
  }

  private def registerPath(name: String, loc: String): Unit = {
    unregister(name)
    spark.sql(s"CREATE TABLE `${validated(name)}` " +
      s"USING graft OPTIONS (path '$loc')")
  }

  /** Durably bind an EXISTING graft table at an arbitrary location under
    * `name` — the external-table attach. Fresh sessions over this
    * warehouse see it without any registration. */
  def attach(name: String, location: String): Unit = {
    require(GraftTable(spark, location).exists,
      s"no graft table at $location")
    registerPath(validated(name), location)
    catalogFile.put(validated(name), location)
  }

  private def unregister(name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `${validated(name)}`")

  /** Register every table recorded in `_catalog.json` OR present as a
    * warehouse subdirectory (pre-catalog-file layouts); backfills the
    * file so the next session auto-attaches. Returns the names bound. */
  def sync(): Seq[String] = {
    val names = listTables
    names.foreach(register)
    names
  }

  /** Tables known to this warehouse: durable catalog entries plus any
    * warehouse subdirectory with a snapshot log (registered or not). */
  def listTables: Seq[String] = {
    val wh = new Path(warehouse)
    val fs = wh.getFileSystem(spark.sessionState.newHadoopConf())
    val listed =
      if (!fs.exists(wh)) Seq.empty
      else fs.listStatus(wh).toSeq
        .filter(st => st.isDirectory &&
          fs.exists(new Path(st.getPath, "_graft")))
        .map(_.getPath.getName)
    (catalogFile.load().keys.toSeq ++ listed).distinct.sorted
  }

  /** Create an empty table from a declared schema and bind its name. */
  def create(name: String, schema: StructType,
      parts: Seq[String] = Seq.empty): GraftTable = {
    val t = table(name).create(schema, parts)
    register(name)
    t
  }

  /** Create (or first-write) from a DataFrame and bind the name. */
  def createFrom(name: String, df: DataFrame,
      parts: Seq[String] = Seq.empty): Long = {
    val id = table(name).append(df, parts)
    register(name)
    id
  }

  def append(name: String, df: DataFrame, parts: Seq[String] = Seq.empty,
      mergeSchema: Boolean = false): Long = {
    val id = table(name).append(df, parts, mergeSchema)
    refresh(name)
    id
  }

  def overwrite(name: String, df: DataFrame,
      parts: Seq[String] = Seq.empty): Long = {
    val id = table(name).overwrite(df, parts)
    refresh(name)
    id
  }

  def merge(name: String, source: DataFrame, keys: Seq[String],
      dedupKey: Seq[String], orderCol: String,
      opCol: Option[String] = None,
      deleteOps: Seq[String] = Seq("D"), mode: String = "cow"): Long = {
    val id = table(name).merge(source, keys, dedupKey, orderCol, opCol,
      deleteOps, mode)
    refresh(name)
    id
  }

  /** Invalidate the cached relation so the next SQL read re-resolves the
    * snapshot; if the table schema evolved past the one recorded at
    * registration, re-register (the session catalog stores the schema a
    * datasource table had at CREATE time). */
  def refresh(name: String): Unit = {
    if (spark.catalog.tableExists(validated(name))) {
      // compare the schema STORED at registration (metadata only — once
      // the table evolved, the stale binding cannot even be re-resolved,
      // so this check must come before any refreshTable resolution)
      val stored = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).schema
      // compare in the RELAXED (all-nullable) form the relation reports
      // — the registration-time inference stored that form
      if (stored != graft.sources.GraftDataSource.relaxNullability(
          table(name).schema)) {
        unregister(name)
        register(name)
      } else spark.catalog.refreshTable(name)
    }
  }

  /** Remove the name binding (session + durable); with `purge`, also
    * delete the table data. */
  def drop(name: String, purge: Boolean = false): Unit = {
    val loc = path(name)
    unregister(name)
    catalogFile.remove(validated(name))
    if (purge) {
      val p = new Path(loc)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(p, true)
    }
  }
}

/** The durable name→location map: `_catalog.json` in the warehouse root,
  * written via tmp + atomic rename so readers never see a torn file. */
private[catalog] class CatalogFile(spark: SparkSession, warehouse: String) {
  import org.json4s._
  import org.json4s.jackson.{JsonMethods, Serialization}
  private implicit val fmts: Formats = DefaultFormats

  private val file = new Path(warehouse, "_catalog.json")
  private def fs = file.getFileSystem(spark.sessionState.newHadoopConf())

  def load(): Map[String, String] =
    if (!fs.exists(file)) Map.empty
    else {
      val in = fs.open(file)
      try JsonMethods.parse(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        .\("tables").extract[Map[String, String]]
      finally in.close()
    }

  def put(name: String, location: String): Unit =
    save(load() + (name -> location))

  def remove(name: String): Unit = save(load() - name)

  private def save(tables: Map[String, String]): Unit = {
    fs.mkdirs(new Path(warehouse))
    val tmp = new Path(warehouse,
      s"._catalog-${java.util.UUID.randomUUID()}.json.tmp")
    val out = fs.create(tmp, false)
    try out.write(Serialization.writePretty(Map("tables" -> tables))
      .getBytes("UTF-8"))
    finally out.close()
    // overwriting rename: the JSON is a whole-state snapshot, so
    // last-writer-wins is the documented concurrency contract here
    fs.delete(file, false)
    if (!fs.rename(tmp, file))
      throw new IllegalStateException(s"failed to publish $file")
  }
}

object GraftCatalog {
  def apply(spark: SparkSession, warehouse: String): GraftCatalog =
    new GraftCatalog(spark, warehouse)
}
