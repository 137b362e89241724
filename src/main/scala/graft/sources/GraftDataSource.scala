package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, BindReferences, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.table.GraftTable

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * Delta-style source integration for graft tables: a custom [[FileIndex]]
  * resolves the live file set from the snapshot log (with time-travel and
  * incremental options) and hands it to Spark's vectorized Parquet reader
  * through HadoopFsRelation, so predicate pushdown, column pruning,
  * partition pruning, and whole-stage codegen all apply unchanged.
  *
  * Read options (mirroring Iceberg's read options,
  * /root/reference/bronze-silver.py:146-149):
  *   - `snapshotId`        time travel to a snapshot
  *   - `startSnapshotId` / `endSnapshotId`  incremental append range
  *     (start exclusive, end inclusive; end defaults to latest)
  *   - `tag` / `branch`    read a named ref (tag: pinned snapshot;
  *     branch: the branch chain's tip)
  *
  * Writes: SaveMode.Append / Overwrite commit through the snapshot log;
  * `partitionCols` option ("a,b") sets the layout on first write.
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider {

  override def shortName(): String = "graft"

  // ---- streaming source: spark.readStream.format("graft").load(path) ----

  private def tableFor(spark: SparkSession,
      parameters: Map[String, String]): GraftTable = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path"))
    val table = GraftTable(spark, path)
    require(table.exists, s"no graft table at $path")
    table
  }

  override def sourceSchema(ctx: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), tableFor(ctx.sparkSession, parameters).schema)

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    new graft.streaming.GraftStreamSource(ctx.sparkSession,
      tableFor(ctx.sparkSession, parameters).location,
      parameters.get("skipRewrites").exists(_.toBoolean))

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = ctx.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path"))
    val mainTable = GraftTable(spark, path)
    require(mainTable.exists, s"no graft table at $path")
    // option("branch", name): resolve the whole read (files, schema,
    // stats) against the branch's chain instead of main's
    val table = parameters.get("branch")
      .map(mainTable.branch).getOrElse(mainTable)

    // (files, as-of snapshot for schema resolution): historical reads use
    // the schema their snapshot was committed under, as Iceberg does —
    // never the latest schema
    val (files: Seq[String], asOf: Option[Long]) =
      parameters.get("startSnapshotId") match {
        case Some(start) =>
          val end = parameters.get("endSnapshotId").map(_.toLong)
            .orElse(table.latestSnapshotId).getOrElse(0L)
          (table.incrementalFiles(start.toLong, end), Some(end))
        case None => parameters.get("snapshotId")
          .map(_.toLong)
          // option("tag", name): read the snapshot a named ref pins
          .orElse(parameters.get("tag").map(t => table.refs.getOrElse(t,
            throw new IllegalArgumentException(
              s"no tag '$t' on $path — known tags: " +
                table.refs.keys.toSeq.sorted.mkString(", "))))) match {
          case Some(id) => (table.liveFiles(Some(id)), Some(id))
          case None => (table.liveFiles(), None)
        }
      }

    // a HadoopFsRelation is a bare file scan — it cannot apply MOR
    // equality-delete tombstones, so refuse rather than resurrect
    // deleted rows (compaction folds tombstones and re-enables this path)
    require(!table.hasApplicableDeletes(files, asOf),
      s"graft table at $path has merge-on-read delete files applying to " +
        "this read; the format(\"graft\") scan cannot merge tombstones — " +
        "read via GraftTable.read()/readAsOf(), or run compact() to fold " +
        "them into data files first")

    // asNullable: parquet files CAN hold nulls in a column the declared
    // schema marks non-nullable (e.g. a MERGE insert clause that leaves
    // the column unassigned); scanning such data through a non-nullable
    // read schema makes the vectorized reader return 0/"" garbage
    // instead of NULL. Spark's own file-based tables relax the read
    // schema the same way (DataSource.resolveRelation), as does
    // GraftTable.read().
    val fullSchema = GraftDataSource.relaxNullability(table.schemaAt(asOf))
    // hidden partitioning: every logical column lives in the data files
    // and the derived dir columns must NOT leak into the schema — the
    // relation is unpartitioned to Spark, and the FileIndex prunes dirs
    // through the transforms from the pushed data filters instead
    val partCols =
      if (table.hasHiddenPartitions) Seq.empty[String] else table.partitionCols
    val partSchema = StructType(partCols.map(fullSchema(_)))
    val dataSchema = StructType(
      fullSchema.filterNot(f => partCols.contains(f.name)))

    HadoopFsRelation(
      location = new GraftFileIndex(spark, table, files, partSchema,
        table.statsFor(files, asOf), table.bytesFor(files, asOf),
        table.rowsFor(files, asOf)),
      partitionSchema = partSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = parameters)(spark)
  }

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = ctx.sparkSession
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path"))
    val table = GraftTable(spark, path)
    // transform-aware split: "days(ts),bucket(16, id)" keeps the comma
    // inside bucket(...) intact
    val parts = parameters.get("partitionCols")
      .map(graft.table.PartitionTransforms.splitSpecs)
      .getOrElse(Seq.empty)
    val evolve = parameters.get("mergeSchema").exists(_.toBoolean)
    val sortBy = parameters.get("sortBy")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    mode match {
      case SaveMode.Append =>
        table.append(data, parts, mergeSchema = evolve, sortBy = sortBy)
      case SaveMode.Overwrite => table.overwrite(data, parts)
      case SaveMode.ErrorIfExists =>
        if (table.exists) throw new IllegalStateException(
          s"graft table already exists: $path")
        table.append(data, parts, mergeSchema = evolve, sortBy = sortBy)
      case SaveMode.Ignore =>
        if (!table.exists)
          table.append(data, parts, mergeSchema = evolve, sortBy = sortBy)
    }
    createRelation(ctx, parameters)
  }
}

object GraftDataSource {
  /** The SQL-surface schema of a graft table: everything nullable.
    * Parquet files CAN hold nulls in a column the declared schema marks
    * non-nullable (a MERGE insert clause that leaves the column
    * unassigned, an evolve null-fill), and scanning such data through a
    * non-nullable read schema makes the vectorized reader return 0/""
    * garbage instead of NULL. Spark's own file-based tables relax the
    * read schema the same way (DataSource.resolveRelation); the session
    * catalog must store the SAME relaxed form or relation re-resolution
    * fails the user-specified-schema equality check. */
  def relaxNullability(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def relax(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(nullable = true, dataType = relax(f.dataType))))
      case a: ArrayType =>
        a.copy(elementType = relax(a.elementType), containsNull = true)
      case m: MapType =>
        m.copy(valueType = relax(m.valueType), valueContainsNull = true)
      case other => other
    }
    relax(schema).asInstanceOf[StructType]
  }
}

/** FileIndex over a graft snapshot's concrete file list. Partition pruning
  * happens HERE, driver-side against dir-encoded values — files of pruned
  * partitions are never listed to the scan (manifest-style pruning; at
  * 100 TB this is what keeps a partition-filtered query from touching the
  * table's full metadata, let alone its data). Data filters are
  * additionally checked against the snapshot log's per-file column
  * min/max ([[graft.table.FileStats]]), so files whose recorded range
  * cannot satisfy a pushed predicate are skipped BEFORE the scan —
  * Iceberg's manifest-stats skipping. */
class GraftFileIndex(spark: SparkSession, val table: GraftTable,
    val files: Seq[String], override val partitionSchema: StructType,
    stats: Map[String, Map[String, graft.table.ColStat]] = Map.empty,
    sizes: Map[String, Long] = Map.empty,
    rows: Map[String, Long] = Map.empty)
    extends FileIndex {

  private val tablePath = new Path(table.location)
  private def fs = tablePath.getFileSystem(spark.sessionState.newHadoopConf())

  override def rootPaths: Seq[Path] = Seq(tablePath)

  /** (partition values row, (relPath, status) files) groups, resolved
    * once. File statuses are SYNTHESIZED from the manifest-recorded sizes
    * — planning a scan then touches no filesystem metadata at all (pure
    * manifest planning, the Iceberg property). Files a pre-size manifest
    * left without a length fall back to ONE listStatus per directory, not
    * one getFileStatus RPC per file — at manifest scale (100k files)
    * per-file calls would serialize 100k metadata round-trips into every
    * query's planning. */
  private lazy val groups: Seq[(InternalRow, Seq[(String, FileStatus)])] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    val unsized = files.filterNot(sizes.contains)
    val byDir = unsized.groupBy(f =>
      f.lastIndexOf('/') match {
        case -1 => ""
        case i => f.substring(0, i)
      })
    val listed: Map[String, FileStatus] = byDir.flatMap {
      case (dir, fs_) =>
        val dirPath = if (dir.isEmpty) tablePath else new Path(tablePath, dir)
        val names = fs_.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
        fs.listStatus(dirPath).toSeq
          .filter(st => names.contains(st.getPath.getName))
          .map(st => (if (dir.isEmpty) st.getPath.getName
                      else s"$dir/${st.getPath.getName}") -> st)
    }
    val wanted = files.toSet
    val statusByRel: Map[String, FileStatus] = listed ++
      sizes.collect { case (rel, len) if wanted.contains(rel) =>
        // mtime 0 is fine: nothing in the scan path reads it (splits use
        // path+length; the vectorized reader opens by path)
        rel -> new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
          new Path(tablePath, rel))
      }

    files.groupBy(f => table.partitionValues(f)).toSeq.map { case (kv, fs_) =>
      val values = InternalRow.fromSeq(partitionSchema.map { field =>
        kv.get(field.name) match {
          case Some(v) if v != "__HIVE_DEFAULT_PARTITION__" =>
            Cast(Literal(UTF8String.fromString(v), StringType),
              field.dataType, Some("UTC")).eval(null)
          case _ => null
        }
      })
      (values, fs_.flatMap(f => statusByRel.get(f).map(st => (f, st))))
    }
  }

  /** Evaluate the prunable conjunct shapes (attr-vs-literal comparisons
    * and IN) against a per-file `check(attr, cmp, value)` probe; anything
    * else conservatively keeps the file. Attributes are top-level
    * columns OR struct-leaf accesses (GetStructField chains), named by
    * their dotted path — the key [[graft.table.FileStats.leafStatFields]]
    * records nested bounds under. */
  private def filtersMayMatch(dataFilters: Seq[Expression],
      check: (String, String, Any) => Boolean): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    object Attr {
      def unapply(e: Expression): Option[String] = e match {
        case a: AttributeReference => Some(a.name)
        case g: GetStructField =>
          unapply(g.child).map(p => s"$p.${g.extractFieldName}")
        case _ => None
      }
    }
    dataFilters.forall {
      case EqualTo(Attr(n), Literal(v, _)) => check(n, "=", v)
      case EqualTo(Literal(v, _), Attr(n)) => check(n, "=", v)
      case LessThan(Attr(n), Literal(v, _)) => check(n, "<", v)
      case LessThan(Literal(v, _), Attr(n)) => check(n, ">", v)
      case LessThanOrEqual(Attr(n), Literal(v, _)) => check(n, "<=", v)
      case LessThanOrEqual(Literal(v, _), Attr(n)) => check(n, ">=", v)
      case GreaterThan(Attr(n), Literal(v, _)) => check(n, ">", v)
      case GreaterThan(Literal(v, _), Attr(n)) => check(n, "<", v)
      case GreaterThanOrEqual(Attr(n), Literal(v, _)) => check(n, ">=", v)
      case GreaterThanOrEqual(Literal(v, _), Attr(n)) => check(n, "<=", v)
      case In(Attr(n), vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(l => check(n, "=", l.asInstanceOf[Literal].value))
      case IsNull(Attr(n)) => check(n, "isnull", null)
      case IsNotNull(Attr(n)) => check(n, "notnull", null)
      case _ => true
    }
  }

  /** Can file `rel` contain rows satisfying every pushed data filter,
    * judged by its recorded column stats? */
  private def statsMayMatch(rel: String, dataFilters: Seq[Expression]): Boolean = {
    val fileStats = stats.getOrElse(rel, Map.empty)
    if (fileStats.isEmpty) return true
    filtersMayMatch(dataFilters, (name, cmp, value) =>
      fileStats.get(name) match {
        // null-count pruning (optimizers inject IsNotNull beside most
        // predicates, so the all-null-file skip fires on ordinary
        // filters too): IS NULL prunes zero-null files; IS NOT NULL
        // prunes files whose every recorded row is null — only with a
        // KNOWN row count, an under-count must never prune
        case Some(cs) if cmp == "isnull" => cs.nulls.forall(_ > 0L)
        case Some(cs) if cmp == "notnull" =>
          rows.get(rel).filter(_ > 0L)
            .forall(n => cs.nulls.forall(_ < n))
        case Some(cs) =>
          graft.table.FileStats.leafType(table.schema, name) match {
            case Some(dt) =>
              graft.table.FileStats.mayMatch(dt, cs, cmp, value)
            case None => true
          }
        case None => true
      })
  }

  private lazy val hiddenFields =
    table.partitionFields.filterNot(_.isIdentity)

  /** Hidden-partitioning dir pruning: map each pushed predicate on a
    * transform SOURCE column through the transform and compare with the
    * file's dir value — days/truncate prune ranges, bucket prunes
    * equality ([[graft.table.PartitionTransforms.mayMatch]]). */
  private def transformsMayMatch(rel: String,
      dataFilters: Seq[Expression]): Boolean = {
    if (hiddenFields.isEmpty) return true
    val kv = table.partitionValues(rel)
    filtersMayMatch(dataFilters, (name, cmp, value) =>
      hiddenFields.filter(_.source == name).forall { f =>
        (kv.get(f.physName), table.schema.find(_.name == name)) match {
          case (Some(dir), Some(sf)) => graft.table.PartitionTransforms
            .mayMatch(f, dir, sf.dataType, cmp, value)
          case _ => true
        }
      })
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference}
    val kept =
      if (partitionFilters.isEmpty) groups
      else {
        val idx = partitionSchema.fieldNames.zipWithIndex.toMap
        // bind by NAME: the filter's attributes carry the relation's
        // exprIds, so positional BindReferences can't resolve them here
        val predicate = partitionFilters.reduce(And).transform {
          case a: AttributeReference if idx.contains(a.name) =>
            BoundReference(idx(a.name),
              partitionSchema(a.name).dataType,
              partitionSchema(a.name).nullable)
        }
        groups.filter { case (row, _) => predicate.eval(row) == true }
      }
    kept.map { case (row, relStatuses) =>
      PartitionDirectory(row,
        relStatuses.filter(rs => statsMayMatch(rs._1, dataFilters) &&
            transformsMayMatch(rs._1, dataFilters))
          .map(_._2).toArray)
    }
  }

  override def inputFiles: Array[String] =
    files.map(f => new Path(tablePath, f).toString).toArray

  override def refresh(): Unit = {}

  override def sizeInBytes: Long =
    groups.map(_._2.map(_._2.getLen).sum).sum
}
