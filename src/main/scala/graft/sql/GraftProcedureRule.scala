package graft.sql

import java.util.Locale

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedProcedure
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, NamedArgumentExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Call, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

import graft.table.{GraftTable, PartitionTransforms}

/** SQL maintenance procedures — the Iceberg `CALL` surface
  * (spark.sql("CALL catalog.system.expire_snapshots(...)")) for graft
  * catalog tables:
  *
  *   CALL graft.expire_snapshots('t', keep_last => 3)
  *   CALL graft.compact('t' [, files_per_partition => n]
  *                          [, target_file_bytes => b] [, sort_by => 'c1,c2']
  *                          [, where => 'pred'])
  *   CALL graft.rewrite_manifests('t')
  *   CALL graft.retrofit_field_ids('t' [, target_file_bytes => b])
  *   CALL graft.prune_dangling_deletes('t')
  *   CALL graft.maintain_rollup('src', dst => 't-or-path',
  *                              keys => 'k1,k2', sums => 'v1', app_id => 'x'
  *                              [, mins => 'v1'] [, maxes => 'v1'])
  *   CALL graft.rollback('t', snapshot_id => 4)
  *   CALL graft.remove_orphan_files('t' [, older_than_ms => 0])
  *   CALL graft.set_partition_spec('t', spec => 'days(ts)')
  *   CALL graft.tag('t', 'v1' [, snapshot_id]) / graft.drop_tag('t', 'v1')
  *   CALL graft.branch('t', 'audit' [, snapshot_id]) / graft.drop_branch(...)
  *   CALL graft.fast_forward('t', 'audit')
  *   CALL graft.import_iceberg('dest-or-path', source => '/ice/table'
  *     [, at => ref-or-id])
  *   CALL graft.import_iceberg_changes('dest-or-path',
  *     source => '/ice/table', since => last-imported-foreign-snapshot-id
  *     [, at => ref-or-id])
  *
  * (`graft.system.<proc>` also accepted.) Spark 4 parses CALL into
  * `Call(UnresolvedProcedure, args)` but only v2 ProcedureCatalogs can
  * resolve it — the graft catalog is a v1 session catalog, so this rule
  * converts the call in the HINTS batch. Each returns one row with the
  * result (new snapshot id, or removed-file count for expire/orphans). */
case class GraftCallCommand(proc: String, location: String,
    args: Map[String, String],
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", LongType, nullable = false)())

  /** A registered graft catalog table's location, or — for names that
    * are paths (contain '/') — the path itself. Used for secondary table
    * arguments resolved at RUN time (the primary table resolves at plan
    * time in [[GraftProcedureRule]]). */
  private def resolveLoc(spark: SparkSession, name: String): String = {
    val cat = spark.sessionState.catalog
    val ident = name.split('.') match {
      case Array(tn) => Some(TableIdentifier(tn))
      case Array(db, tn) => Some(TableIdentifier(tn, Some(db)))
      case _ => None
    }
    ident.filter(cat.tableExists).flatMap { id =>
      val m = cat.getTableMetadata(id)
      if (m.provider.exists(_.equalsIgnoreCase("graft")))
        m.storage.properties.get("path")
          .orElse(m.storage.locationUri.map(_.toString))
      else None
    }.getOrElse {
      require(name.contains("/"),
        s"must be a registered graft table or a path: $name")
      name
    }
  }

  /** When `catalog_uri` is present, `ref` is a namespace.table
    * identifier the Iceberg REST catalog resolves to the table's
    * current metadata-location; otherwise `ref` passes through as a
    * path. */
  private def catalogResolved(args: Map[String, String],
      ref: String): String = args.get("catalog_uri") match {
    case Some(uri) =>
      graft.catalog.RestCatalog.loadTableMetadataLocation(uri, ref)
    case None => ref
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable(spark, location)
    def longArg(k: String): Option[Long] = args.get(k).map(_.toLong)
    def specArg(k: String): Seq[String] =
      args.get(k).map(PartitionTransforms.splitSpecs).getOrElse(Seq.empty)
    def required(k: String): Long = longArg(k).getOrElse(
      throw new IllegalArgumentException(s"graft.$proc needs $k"))
    val result: Long = proc match {
      case "expire_snapshots" =>
        // destructive — no defaults: a typo'd argument name must not
        // silently expire everything down to one snapshot. Either form:
        // keep_last => N, or older_than_ms => T [, retain_last => N]
        (longArg("keep_last"), longArg("older_than_ms")) match {
          case (Some(n), None) => t.expireSnapshots(n.toInt).size.toLong
          case (None, Some(ts)) => t.expireOlderThan(ts,
            longArg("retain_last").getOrElse(1L).toInt).size.toLong
          case _ => throw new IllegalArgumentException(
            "graft.expire_snapshots needs exactly one of keep_last / " +
              "older_than_ms")
        }
      case "compact" =>
        val where = args.get("where")
          .map(org.apache.spark.sql.functions.expr)
        val zorder = specArg("zorder_by")
        if (zorder.nonEmpty)
          // OPTIMIZE ... ZORDER BY: multi-dimensional interleaved-bit
          // clustering (file pruning on every listed column)
          t.compactZOrder(zorder,
            longArg("zorder_bits").getOrElse(12L).toInt,
            longArg("files_per_partition").getOrElse(1L).toInt, where)
        else longArg("target_file_bytes") match {
          case Some(b) => t.compactToSize(b, specArg("sort_by"), where)
          case None => t.compact(
            longArg("files_per_partition").getOrElse(1L).toInt,
            specArg("sort_by"), where)
        }
      case "compact_small_files" =>
        // binpack maintenance: -1 = nothing met the trigger (no commit)
        t.compactSmallFiles(
          longArg("target_file_bytes").getOrElse(128L * 1024 * 1024),
          longArg("small_file_bytes").getOrElse(0L),
          longArg("min_input_files").getOrElse(2L).toInt)
          .getOrElse(-1L)
      case "rewrite_manifests" => t.rewriteManifests()
      case "retrofit_field_ids" => longArg("target_file_bytes") match {
        case Some(b) => t.retrofitFieldIds(b)
        case None => t.retrofitFieldIds()
      }
      case "prune_dangling_deletes" => t.pruneDanglingDeletes()
      case "maintain_rollup" =>
        // first arg = the SOURCE (always exists); dst may be created by
        // the first round, so it resolves by registered name OR path
        def req(k: String): String = args.getOrElse(k,
          throw new IllegalArgumentException(s"graft.$proc needs $k"))
        def list(k: String): Seq[String] =
          req(k).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        def optList(k: String): Seq[String] = args.get(k).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val dst = GraftTable(spark, resolveLoc(spark, req("dst")))
        graft.pipeline.IncrementalRollup.maintain(
          t, dst, list("keys"), list("sums"), req("app_id"),
          minCols = optList("mins"), maxCols = optList("maxes"))
          .map(_._2).getOrElse(-1L)
      case "rollback" => t.rollback(required("snapshot_id"))
      case "remove_orphan_files" =>
        t.removeOrphanFiles(longArg("older_than_ms")
          .getOrElse(3L * 24 * 60 * 60 * 1000)).size.toLong
      case "set_partition_spec" =>
        // require the spec key: a typo'd name must not silently
        // UNPARTITION the table (empty spec is legal via spec => '')
        require(args.contains("spec"), s"graft.$proc needs spec")
        t.updatePartitionSpec(specArg("spec"))
      case "tag" =>
        t.tag(args.getOrElse("name", throw new IllegalArgumentException(
          s"graft.$proc needs name")), longArg("snapshot_id"))
      case "drop_tag" =>
        t.dropTag(args.getOrElse("name",
          throw new IllegalArgumentException(s"graft.$proc needs name")))
      case "branch" =>
        t.createBranch(args.getOrElse("name",
          throw new IllegalArgumentException(s"graft.$proc needs name")),
          longArg("snapshot_id"))
      case "drop_branch" =>
        t.dropBranch(args.getOrElse("name",
          throw new IllegalArgumentException(s"graft.$proc needs name")))
        0L
      case "fast_forward" =>
        t.fastForward(args.getOrElse("name",
          throw new IllegalArgumentException(s"graft.$proc needs name")))
      case "import_iceberg" =>
        // foreign Iceberg v2 tree → append commit into THIS table
        // (created if absent); `at` time-travels the foreign history;
        // catalog_uri resolves a namespace.table source through the
        // REST catalog first
        val source = catalogResolved(args, args.getOrElse("source",
          throw new IllegalArgumentException(s"graft.$proc needs source")))
        graft.iceberg.IcebergImport.importInto(spark, source, location,
          at = args.get("at"))
          .latestSnapshotId.getOrElse(-1L)
      case "append_iceberg" =>
        // WRITE-BACK: commit the named Spark table/view into the FOREIGN
        // Iceberg tree at the target path as one v2 append snapshot
        val source = args.getOrElse("source",
          throw new IllegalArgumentException(s"graft.$proc needs source"))
        // branch => stage the commit on that ref (write-audit-publish);
        // main readers see nothing until fast_forward_iceberg lands it.
        // catalog_uri => the location is a namespace.table identifier
        // and the commit publishes THROUGH the REST catalog
        args.get("catalog_uri") match {
          case Some(uri) =>
            graft.iceberg.IcebergWriteBack.appendToCatalog(spark, uri,
              location, spark.table(source), branch = args.get("branch"))
          case None =>
            graft.iceberg.IcebergWriteBack.appendTo(spark, location,
              spark.table(source), branch = args.get("branch"))
        }
      case "delete_iceberg" =>
        // row-level WRITE-BACK: tombstone the foreign rows matching the
        // predicate as one v2 position-delete snapshot; catalog_uri =>
        // the location is an identifier and the commit goes back
        // through the REST catalog
        val where = args.getOrElse("where",
          throw new IllegalArgumentException(s"graft.$proc needs where"))
        args.get("catalog_uri") match {
          case Some(uri) => graft.iceberg.IcebergWriteBack
            .deleteWhereCatalog(spark, uri, location,
              org.apache.spark.sql.functions.expr(where))
          case None => graft.iceberg.IcebergWriteBack.deleteWhere(spark,
            location, org.apache.spark.sql.functions.expr(where))
        }
      case "delete_iceberg_keys" =>
        // key-based WRITE-BACK: v2 equality-delete snapshot, O(keys)
        // with no table scan — the view's columns ARE the key columns
        val source = args.getOrElse("source",
          throw new IllegalArgumentException(s"graft.$proc needs source"))
        args.get("catalog_uri") match {
          case Some(uri) => graft.iceberg.IcebergWriteBack
            .deleteKeysCatalog(spark, uri, location, spark.table(source))
          case None => graft.iceberg.IcebergWriteBack.deleteKeys(spark,
            location, spark.table(source))
        }
      case "merge_iceberg" =>
        // row-level WRITE-BACK: keyed upsert of a Spark table/view into
        // the foreign tree as one overwrite snapshot (position deletes
        // for matched keys + data files for every source row)
        val source = args.getOrElse("source",
          throw new IllegalArgumentException(s"graft.$proc needs source"))
        val keys = args.getOrElse("keys",
          throw new IllegalArgumentException(s"graft.$proc needs keys"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val eq = args.get("deletes") match {
          case None | Some("position") => false
          case Some("equality") => true
          case Some(other) => throw new IllegalArgumentException(
            s"graft.$proc deletes must be position|equality, got $other")
        }
        args.get("catalog_uri") match {
          case Some(uri) => graft.iceberg.IcebergWriteBack
            .mergeIntoCatalog(spark, uri, location, spark.table(source),
              keys, equalityDeletes = eq)
          case None => graft.iceberg.IcebergWriteBack.mergeInto(spark,
            location, spark.table(source), keys, equalityDeletes = eq)
        }
      case "register_iceberg" =>
        // SQL over a FOREIGN tree without import: a temp view over the
        // composed MOR read (scan + delete anti-joins). The view pins
        // the snapshot resolved NOW — Iceberg's plan-time semantics;
        // re-register to see later foreign commits. Returns the pinned
        // snapshot id.
        val viewName = args.getOrElse("name",
          throw new IllegalArgumentException(s"graft.$proc needs name"))
        val at = args.get("at")
        // with catalog_uri the positional arg is a namespace.table
        // identifier the REST catalog resolves to a metadata-location
        // (an exact-version read handle the import honors verbatim)
        val resolved = catalogResolved(args, location)
        val view = graft.iceberg.IcebergImport.read(spark, resolved, at)
        view.createOrReplaceTempView(viewName)
        val pinned = graft.iceberg.IcebergImport
          .plan(spark, resolved, at).snapshotId
        // COUNT(*) on the view answers from manifests when exact
        // ([[GraftForeignCountRule]]), pinned to the SAME snapshot
        GraftForeignCountRule.register(view.queryExecution.analyzed,
          resolved, Some(pinned.toString))
        pinned
      case "expire_iceberg" =>
        // foreign-tree maintenance: metadata-only snapshot expiry (no
        // file deletion — other engines may be reading pinned
        // snapshots); catalog_uri => the expiry publishes as the
        // protocol's remove-snapshots update
        val cat = args.get("catalog_uri").map(uri => (uri, location))
        val loc = cat.map { case (uri, id) => graft.catalog.RestCatalog
          .loadTableMetadataLocation(uri, id) }.getOrElse(location)
        graft.iceberg.IcebergWriteBack.expireSnapshots(spark, loc,
          longArg("keep_last").getOrElse(1L).toInt,
          catalog = cat).toLong
      case "tag_iceberg" | "branch_iceberg" | "drop_ref_iceberg" |
          "rollback_iceberg" | "fast_forward_iceberg" =>
        // snapshot refs on a FOREIGN tree: a tag is a durable
        // time-travel label, a branch a mutable staging line
        // (append_iceberg branch => commits onto it); metadata-only.
        // With catalog_uri the location is a namespace.table identifier
        // and the ref change publishes THROUGH the catalog
        // (set/remove-snapshot-ref updates)
        val cat = args.get("catalog_uri").map(uri => (uri, location))
        val loc = cat.map { case (uri, id) => graft.catalog.RestCatalog
          .loadTableMetadataLocation(uri, id) }.getOrElse(location)
        def named = args.getOrElse("name",
          throw new IllegalArgumentException(s"graft.$proc needs name"))
        proc match {
          case "tag_iceberg" | "branch_iceberg" =>
            graft.iceberg.IcebergWriteBack.createRef(spark, loc, named,
              if (proc == "tag_iceberg") "tag" else "branch",
              longArg("snapshot_id"), catalog = cat)
          case "drop_ref_iceberg" =>
            graft.iceberg.IcebergWriteBack.dropRef(spark, loc, named,
              catalog = cat)
          case "rollback_iceberg" =>
            // history surgery: set main back to an ancestor snapshot —
            // rolled-past commits stay time-travelable
            graft.iceberg.IcebergWriteBack.rollbackTo(spark, loc,
              longArg("snapshot_id").getOrElse(
                throw new IllegalArgumentException(
                  s"graft.$proc needs snapshot_id")), catalog = cat)
          case _ =>
            // the write-audit-publish landing step: advance `branch`
            // (usually 'main') to `to`'s head iff pure fast-forward
            graft.iceberg.IcebergWriteBack.fastForward(spark, loc,
              args.getOrElse("branch",
                throw new IllegalArgumentException(
                  s"graft.$proc needs branch")),
              args.getOrElse("to", throw new IllegalArgumentException(
                s"graft.$proc needs to")), catalog = cat)
        }
      case "upgrade_iceberg" =>
        // metadata-only format-version upgrade (v1→2 enables write-back
        // sequence semantics; v2→3 enables row lineage + DVs)
        graft.iceberg.IcebergWriteBack.upgradeFormatVersion(spark,
          location, longArg("to").getOrElse(
            throw new IllegalArgumentException(
              s"graft.$proc needs to => 2|3")).toInt).toLong
      case "rewrite_manifests_iceberg" | "compact_iceberg" |
          "rewrite_position_deletes_iceberg" =>
        // foreign-tree MAINTENANCE — rewrite_manifests consolidates
        // small data/delete manifests (metadata-only; the manifest-list
        // growth fix), compact binpacks small data files (deletes
        // consumed into the rewrite), rewrite_position_deletes
        // consolidates accreted position tombstones (v2: one sorted
        // set, dangling positions dropped; v3: legacy parquet deletes
        // convert to deletion vectors). Each is ONE replace commit.
        // With catalog_uri the location is a namespace.table identifier
        // and the replace snapshot commits THROUGH the catalog —
        // replaced manifests are baked into the client-written manifest
        // list, so the protocol needs only add-snapshot + set-ref; the
        // production streaming-sink table (catalog-owned, one commit
        // per micro-batch) is exactly the table that accretes fastest.
        val cat = args.get("catalog_uri").map(uri => (uri, location))
        val loc = cat.map { case (uri, id) => graft.catalog.RestCatalog
          .loadTableMetadataLocation(uri, id) }.getOrElse(location)
        proc match {
          case "rewrite_manifests_iceberg" =>
            graft.iceberg.IcebergWriteBack.rewriteManifests(spark, loc,
              smallManifestBytes = longArg("small_manifest_bytes")
                .getOrElse(8L << 20),
              minInputManifests = longArg("min_input_manifests")
                .getOrElse(2L).toInt, catalog = cat)
          case "rewrite_position_deletes_iceberg" =>
            graft.iceberg.IcebergWriteBack.rewritePositionDeletes(spark,
              loc, minInputFiles = longArg("min_input_files")
                .getOrElse(2L).toInt, catalog = cat)
          case _ =>
            graft.iceberg.IcebergWriteBack.compactSmallFiles(spark, loc,
              smallFileBytes = longArg("small_file_bytes")
                .getOrElse(32L << 20),
              targetFileBytes = longArg("target_file_bytes")
                .getOrElse(128L << 20),
              minInputFiles = longArg("min_input_files")
                .getOrElse(2L).toInt, catalog = cat)
        }
      case "evolve_iceberg" =>
        // metadata-only schema evolution on a FOREIGN tree: op is one of
        // add (col + type), rename (col + to), widen (col + type)
        val op = args.getOrElse("op",
          throw new IllegalArgumentException(s"graft.$proc needs op"))
        val colName = args.getOrElse("col",
          throw new IllegalArgumentException(s"graft.$proc needs col"))
        (op match {
          case "add" =>
            val t = args.getOrElse("type",
              throw new IllegalArgumentException(
                s"graft.$proc op=add needs type"))
            // v3 field default, typed by the declared column type
            val dflt: Option[Any] = args.get("default").map(s => t match {
              case "boolean" => s.toBoolean
              case "int" => s.toInt
              case "long" => s.toLong
              case "float" => s.toFloat
              case "double" => s.toDouble
              case _ => s
            })
            graft.iceberg.IcebergWriteBack.addColumn(
              spark, location, colName, t, dflt)
          case "rename" => graft.iceberg.IcebergWriteBack.renameColumn(
            spark, location, colName, args.getOrElse("to",
              throw new IllegalArgumentException(
                s"graft.$proc op=rename needs to")))
          case "widen" => graft.iceberg.IcebergWriteBack.widenColumn(
            spark, location, colName, args.getOrElse("type",
              throw new IllegalArgumentException(
                s"graft.$proc op=widen needs type")))
          case "add_partition_field" =>
            // PARTITION-SPEC evolution: new default spec = old fields
            // + transform(col); old files keep their spec, new writes
            // lay out under the evolved one
            graft.iceberg.IcebergWriteBack.addPartitionField(
              spark, location, colName, args.getOrElse("transform",
                throw new IllegalArgumentException(
                  s"graft.$proc op=add_partition_field needs " +
                    "transform")), args.get("name"))
          case other => throw new IllegalArgumentException(
            s"graft.$proc op must be add|rename|widen|" +
              s"add_partition_field, got $other")
        }).toLong
      case "create_iceberg" =>
        // catalog-first CREATE TABLE (the reference's
        // create-if-not-exists bronze shape): the CATALOG builds and
        // owns the initial metadata from the declared schema; the
        // first append_iceberg(catalog_uri =>) then commits against
        // the null-form main assert. Returns 1.
        val uri = args.getOrElse("catalog_uri",
          throw new IllegalArgumentException(
            s"graft.$proc is catalog-first: it needs catalog_uri => " +
              "(filesystem trees are created by export_iceberg)"))
        val ddl = args.getOrElse("schema",
          throw new IllegalArgumentException(
            s"graft.$proc needs schema => 'col type, ...'"))
        graft.iceberg.IcebergExport.createTableCatalog(spark, uri,
          location, org.apache.spark.sql.types.StructType.fromDDL(ddl),
          partitionBy = specArg("partition_by"),
          location = args.get("location"),
          formatVersion = longArg("format_version")
            .getOrElse(2L).toInt,
          ifNotExists = args.get("if_not_exists")
            .exists(_.toBoolean))
        1L
      case "drop_iceberg" =>
        // catalog-first DROP: the catalog forgets the binding; no
        // file is purged (shared-tree contract, same as expire's —
        // other engines may hold pinned snapshots). Returns 1 when
        // dropped, 0 when if_exists absorbed a 404.
        val uri = args.getOrElse("catalog_uri",
          throw new IllegalArgumentException(
            s"graft.$proc is catalog-first: it needs catalog_uri =>"))
        if (graft.catalog.RestCatalog.dropTable(uri, location,
          ifExists = args.get("if_exists").exists(_.toBoolean))) 1L
        else 0L
      case "rename_iceberg" =>
        // catalog-first RENAME: only the name -> table binding moves;
        // metadata, history and data are untouched
        val uri = args.getOrElse("catalog_uri",
          throw new IllegalArgumentException(
            s"graft.$proc is catalog-first: it needs catalog_uri =>"))
        graft.catalog.RestCatalog.renameTable(uri, location,
          args.getOrElse("to", throw new IllegalArgumentException(
            s"graft.$proc needs to => 'ns.newname'")))
        1L
      case "import_iceberg_changes" =>
        // incremental FOLLOW: append only the foreign (since, target]
        // append-delta into this table (IcebergImport.readChanges rules:
        // append-only range, else fail loud with full-import guidance)
        val source = catalogResolved(args, args.getOrElse("source",
          throw new IllegalArgumentException(s"graft.$proc needs source")))
        graft.iceberg.IcebergImport.importChangesInto(spark, source, t,
          longArg("since").getOrElse(throw new IllegalArgumentException(
            s"graft.$proc needs since (the last imported foreign " +
              "snapshot id)")), at = args.get("at"))
      case other => throw new UnsupportedOperationException(
        s"unknown graft procedure: $other — supported: " +
          "expire_snapshots, compact, compact_small_files, " +
          "rewrite_manifests, " +
          "retrofit_field_ids, prune_dangling_deletes, maintain_rollup, " +
          "rollback, remove_orphan_files, set_partition_spec, tag, " +
          "drop_tag, branch, drop_branch, fast_forward, import_iceberg, " +
          "import_iceberg_changes, append_iceberg, delete_iceberg, " +
          "delete_iceberg_keys, merge_iceberg, evolve_iceberg, " +
          "compact_iceberg, rewrite_manifests_iceberg, expire_iceberg, " +
          "register_iceberg, upgrade_iceberg, tag_iceberg, " +
          "branch_iceberg, drop_ref_iceberg, rollback_iceberg, " +
          "fast_forward_iceberg, rewrite_position_deletes_iceberg, " +
          "create_iceberg, drop_iceberg, rename_iceberg")
    }
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq(Row(result))
  }
}

object GraftProcedureRule {
  /** Procedures whose first argument may be a PATH (a foreign tree or a
    * destination path) rather than a registered session-catalog table.
    * ONE registration point — this set and [[catalogProcs]] used to be
    * two parallel `proc == ...` chains edited in lockstep, a drift
    * hazard (a procedure added to one but not the other routed
    * 'ns.table' identifiers into the session-catalog lookup). */
  val pathProcs: Set[String] = Set(
    "import_iceberg", "import_iceberg_changes", "create_iceberg",
    "drop_iceberg", "rename_iceberg", "append_iceberg",
    "delete_iceberg", "delete_iceberg_keys", "merge_iceberg",
    "evolve_iceberg", "compact_iceberg", "rewrite_manifests_iceberg",
    "rewrite_position_deletes_iceberg", "expire_iceberg",
    "register_iceberg", "upgrade_iceberg", "tag_iceberg",
    "branch_iceberg", "drop_ref_iceberg", "rollback_iceberg",
    "fast_forward_iceberg")

  /** Procedures where `catalog_uri =>` makes the first argument a
    * namespace.table identifier the REST catalog resolves. */
  val catalogProcs: Set[String] = Set(
    "register_iceberg", "append_iceberg", "delete_iceberg",
    "delete_iceberg_keys", "merge_iceberg", "tag_iceberg",
    "branch_iceberg", "drop_ref_iceberg", "rollback_iceberg",
    "fast_forward_iceberg", "expire_iceberg", "compact_iceberg",
    "rewrite_manifests_iceberg", "rewrite_position_deletes_iceberg",
    "create_iceberg", "drop_iceberg", "rename_iceberg")
}

class GraftProcedureRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** ONE registration point per procedure: positional argument names
    * (after the leading table) plus named-only extras. Argument names
    * are validated against this — an unknown (typically typo'd) name
    * must error, never silently fall back to a default, because several
    * defaults are destructive. */
  private val signatures: Map[String, (Seq[String], Set[String])] = Map(
    "expire_snapshots" -> (Seq("keep_last"),
      Set("older_than_ms", "retain_last")),
    "compact" -> (Seq("files_per_partition"),
      Set("target_file_bytes", "sort_by", "where", "zorder_by",
        "zorder_bits")),
    "compact_small_files" -> (Seq("target_file_bytes"),
      Set("small_file_bytes", "min_input_files")),
    "rewrite_manifests" -> (Seq.empty, Set.empty),
    "retrofit_field_ids" -> (Seq.empty, Set("target_file_bytes")),
    "prune_dangling_deletes" -> (Seq.empty, Set.empty),
    "maintain_rollup" -> (Seq.empty,
      Set("dst", "keys", "sums", "app_id", "mins", "maxes")),
    "rollback" -> (Seq("snapshot_id"), Set.empty),
    "remove_orphan_files" -> (Seq("older_than_ms"), Set.empty),
    "set_partition_spec" -> (Seq("spec"), Set.empty),
    "tag" -> (Seq("name", "snapshot_id"), Set.empty),
    "drop_tag" -> (Seq("name"), Set.empty),
    "branch" -> (Seq("name", "snapshot_id"), Set.empty),
    "drop_branch" -> (Seq("name"), Set.empty),
    "fast_forward" -> (Seq("name"), Set.empty),
    // import a FOREIGN Iceberg v2 table (hand-walk, no Iceberg jar —
    // iceberg.IcebergImport) into the named graft table (append; the
    // table may be a not-yet-existing path): CALL graft.import_iceberg(
    //   'dest-table-or-path', source => '/path/to/iceberg' [, at => ref]
    //   [, catalog_uri => 'http://...' — source becomes ns.table])
    "import_iceberg" -> (Seq("source"), Set("at", "catalog_uri")),
    // incremental follow of a foreign table: CALL
    //   graft.import_iceberg_changes('dest', source => '/path',
    //     since => <last imported foreign snapshot id> [, at => ref]
    //     [, catalog_uri => ...])
    "import_iceberg_changes" -> (Seq("source", "since"),
      Set("at", "catalog_uri")),
    // WRITE-BACK: append a Spark table/view into a FOREIGN Iceberg v2
    // tree (iceberg.IcebergWriteBack) as one snapshot commit: CALL
    //   graft.append_iceberg('/path/to/iceberg', source => 'view_name'
    //     [, branch => 'audit' — stage on a ref, WAP-style])
    //   graft.append_iceberg('ns.table', source => 'view',
    //     catalog_uri => 'http://...') — resolve AND commit through
    //     the REST catalog (CommitTableRequest; catalog owns the swap)
    "append_iceberg" -> (Seq("source"), Set("branch", "catalog_uri")),
    // row-level write-back into a FOREIGN tree: CALL
    //   graft.delete_iceberg('/path/to/iceberg', where => 'id % 3 = 0')
    //   graft.merge_iceberg('/path/to/iceberg', source => 'view',
    //     keys => 'id')   — keys is a comma-separated column list
    //   each row-level proc also takes catalog_uri => (the location is
    //   then a namespace.table identifier; the commit publishes back
    //   THROUGH the REST catalog; v3 row lineage advances via the
    //   snapshot's first-row-id/added-rows fields)
    "delete_iceberg" -> (Seq("where"), Set("catalog_uri")),
    //   graft.delete_iceberg_keys('/path', source => 'keys_view')
    //     — equality deletes; the view's columns are the key columns
    "delete_iceberg_keys" -> (Seq("source"), Set("catalog_uri")),
    //   graft.merge_iceberg(..., deletes => 'equality') upserts with
    //     equality tombstones (no target scan — the streaming shape)
    "merge_iceberg" -> (Seq("source", "keys"),
      Set("deletes", "catalog_uri")),
    //   graft.evolve_iceberg('/path',
    //     op => 'add|rename|widen|add_partition_field',
    //     col => 'c' [, type => 'long'] [, to => 'newname']
    //     [, default => '7' — v3 initial-default, typed by `type`]
    //     [, transform => 'bucket[8]' and optional name => 'c_b8'
    //        for op=add_partition_field — spec evolution])
    "evolve_iceberg" -> (Seq("op", "col"),
      Set("type", "to", "default", "transform", "name")),
    //   graft.compact_iceberg('/path' [, small_file_bytes => N,
    //     target_file_bytes => N, min_input_files => N])
    "compact_iceberg" -> (Seq.empty[String],
      Set("small_file_bytes", "target_file_bytes", "min_input_files",
        "catalog_uri")),
    //   graft.rewrite_manifests_iceberg('/path'
    //     [, small_manifest_bytes => N, min_input_manifests => N])
    //     — consolidate small data manifests, metadata-only
    "rewrite_manifests_iceberg" -> (Seq.empty[String],
      Set("small_manifest_bytes", "min_input_manifests",
        "catalog_uri")),
    //   graft.rewrite_position_deletes_iceberg('/path'
    //     [, min_input_files => N]) — consolidate position tombstones
    //     (v3: convert legacy parquet deletes to deletion vectors)
    "rewrite_position_deletes_iceberg" -> (Seq.empty[String],
      Set("min_input_files", "catalog_uri")),
    //   graft.expire_iceberg('/path', keep_last => N
    //     [, catalog_uri => ... — remove-snapshots via the protocol])
    "expire_iceberg" -> (Seq("keep_last"), Set("catalog_uri")),
    // snapshot refs on a FOREIGN tree (metadata-only commits):
    //   graft.tag_iceberg('/path', name => 'v1' [, snapshot_id => N])
    //   graft.branch_iceberg('/path', name => 'audit'
    //     [, snapshot_id => N])
    //   graft.drop_ref_iceberg('/path', name => 'v1')
    //   graft.rollback_iceberg('/path', snapshot_id => N) — main back
    //     to an ancestor; rolled-past commits stay time-travelable
    //   graft.fast_forward_iceberg('/path', branch => 'main',
    //     to => 'audit') — the WAP landing step
    //   each ref proc also takes catalog_uri => (identifier location;
    //   the ref change publishes through set/remove-snapshot-ref)
    "tag_iceberg" -> (Seq("name"), Set("snapshot_id", "catalog_uri")),
    "branch_iceberg" -> (Seq("name"),
      Set("snapshot_id", "catalog_uri")),
    "drop_ref_iceberg" -> (Seq("name"), Set("catalog_uri")),
    "rollback_iceberg" -> (Seq("snapshot_id"), Set("catalog_uri")),
    "fast_forward_iceberg" -> (Seq("branch", "to"),
      Set("catalog_uri")),
    //   graft.upgrade_iceberg('/path', to => 3) — one-way ladder
    "upgrade_iceberg" -> (Seq("to"), Set.empty[String]),
    //   graft.register_iceberg('/path', name => 'view' [, at => ref])
    //     — snapshot-pinned temp view for plain SQL over a foreign tree;
    //   graft.register_iceberg('ns.table', name => 'view',
    //     catalog_uri => 'http://...') resolves the identifier through
    //     an Iceberg REST catalog first (catalog.RestCatalog)
    "register_iceberg" -> (Seq("name"), Set("at", "catalog_uri")),
    //   graft.create_iceberg('ns.table', schema => 'id long, v string',
    //     catalog_uri => 'http://...' [, location => '/path']
    //     [, partition_by => 'days(ts), region']
    //     [, if_not_exists => 'true'] [, format_version => 3]) —
    //     catalog-first CREATE (the catalog writes the initial
    //     metadata; no snapshot until the first append)
    "create_iceberg" -> (Seq("schema"),
      Set("catalog_uri", "location", "partition_by", "if_not_exists",
        "format_version")),
    //   graft.drop_iceberg('ns.table', catalog_uri => 'http://...'
    //     [, if_exists => 'true']) — the catalog forgets the binding;
    //     files are not purged (shared-tree contract)
    "drop_iceberg" -> (Seq.empty[String],
      Set("catalog_uri", "if_exists")),
    //   graft.rename_iceberg('ns.old', to => 'ns.new',
    //     catalog_uri => 'http://...') — binding-only move
    "rename_iceberg" -> (Seq("to"), Set("catalog_uri")))

  private def procName(parts: Seq[String]): Option[String] =
    parts.map(_.toLowerCase(Locale.ROOT)) match {
      case Seq("graft", p) => Some(p)
      case Seq("graft", "system", p) => Some(p)
      case _ => None
    }

  private def litString(e: Expression, what: String): String = {
    require(e.foldable, s"CALL argument $what must be a literal, got ${e.sql}")
    val v = e.eval(null)
    require(v != null, s"CALL argument $what must not be NULL")
    v.toString
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Call(UnresolvedProcedure(parts), callArgs, _)
        if procName(parts).isDefined =>
      val proc = procName(parts).get
      val (posNames, extraNamed) = signatures.getOrElse(proc,
        throw new UnsupportedOperationException(
          s"unknown graft procedure: $proc — supported: " +
            signatures.keys.toSeq.sorted.mkString(", ")))
      // first positional arg is the catalog table name; the rest map to
      // the procedure's positional names or arrive named (k => v)
      var posIdx = -1
      val kvs = callArgs.map {
        case NamedArgumentExpression(k, v) =>
          k.toLowerCase(Locale.ROOT) -> litString(v, k)
        case e =>
          posIdx += 1
          if (posIdx == 0) "table" -> litString(e, "table")
          else {
            require(posIdx <= posNames.size, s"too many arguments for " +
              s"graft.$proc (positional: table, ${posNames.mkString(", ")})")
            posNames(posIdx - 1) -> litString(e, posNames(posIdx - 1))
          }
      }.toMap
      val allowed = posNames.toSet ++ extraNamed
      val unknown = kvs.keys.filterNot(k => k == "table" || allowed(k))
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"unknown argument(s) for graft.$proc: ${unknown.mkString(", ")}" +
          s" — accepted: ${allowed.toSeq.sorted.mkString(", ")}")
      val name = kvs.getOrElse("table", throw new IllegalArgumentException(
        s"graft.$proc needs a table name as its first argument"))
      // import_iceberg may target a PATH (the destination table often
      // does not exist yet — importInto creates it)
      if (GraftProcedureRule.pathProcs(proc) &&
          (name.contains("/") ||
            // with catalog_uri the name is a namespace.table identifier
            // the REST catalog resolves — never a session-catalog table
            (GraftProcedureRule.catalogProcs(proc) &&
              kvs.contains("catalog_uri"))))
        GraftCallCommand(proc, name, kvs - "table", None)
      else {
        // accept db-qualified names, matching the ALTER rule's resolution
        val ident = name.split('.') match {
          case Array(t) => TableIdentifier(t)
          case Array(db, t) => TableIdentifier(t, Some(db))
          case _ => throw new IllegalArgumentException(
            s"invalid table name: $name")
        }
        val cat = spark.sessionState.catalog
        require(cat.tableExists(ident), s"no such table: $name")
        val meta = cat.getTableMetadata(ident)
        require(meta.provider.exists(_.equalsIgnoreCase("graft")),
          s"$name is not a graft table")
        val loc = meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.toString))
          .getOrElse(throw new IllegalStateException(s"no path for $name"))
        GraftCallCommand(proc, loc, kvs - "table", Some(ident))
      }
  }
}
