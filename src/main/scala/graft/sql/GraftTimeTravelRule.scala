package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.TimestampType

import graft.table.GraftTable

/** SQL time travel for graft catalog tables — the Iceberg/Delta syntax:
  *
  *   SELECT ... FROM t VERSION AS OF 3
  *   SELECT ... FROM t TIMESTAMP AS OF '2026-08-12 10:00:00'
  *
  * VERSION AS OF takes a snapshot id; TIMESTAMP AS OF resolves to the
  * last snapshot committed at or before the (UTC) timestamp. The
  * relation is rebuilt through the graft source with the `snapshotId`
  * option, so the scan runs under that snapshot's file set AND schema
  * (historical schema semantics, like the Scala `readAsOf`). */
class GraftTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** (path, graft?) for a catalog-registered graft table name. */
  private def graftPath(u: UnresolvedRelation): Option[String] = {
    val parts = u.multipartIdentifier
    if (parts.size > 2) return None
    val ident =
      if (parts.size == 2) TableIdentifier(parts(1), Some(parts(0)))
      else TableIdentifier(parts.head)
    val catalog = spark.sessionState.catalog
    if (!catalog.tableExists(ident)) return None
    val meta = catalog.getTableMetadata(ident)
    if (!meta.provider.exists(_.equalsIgnoreCase("graft"))) return None
    meta.storage.properties.get("path")
      .orElse(meta.storage.locationUri.map(_.toString))
  }

  /** Read options selecting the travel target: a snapshot id, or a
    * branch ref (branch names resolve to a branch-chain read, not a main
    * snapshot id — their tips live in branch slots). */
  private def travelOptions(table: GraftTable, tsExpr: Option[Expression],
      version: Option[String]): Map[String, String] = version match {
    // snapshot ids vs ref names: one shared classifier — everything
    // else, including '' and overflow-length digit runs, resolves as a
    // ref so the error names the real fix
    case Some(v) if !GraftTable.isSnapshotIdString(v) &&
        !table.refs.contains(v) && table.branches.contains(v) =>
      Map("branch" -> v)
    case other =>
      Map("snapshotId" -> snapshotFor(table, tsExpr, other).toString)
  }

  private def snapshotFor(table: GraftTable, tsExpr: Option[Expression],
      version: Option[String]): Long = version match {
    // snapshot ids vs tag names: one shared classifier — everything
    // else, including '' and overflow-length digit runs, resolves as a
    // tag so the error names the real fix
    case Some(v) if GraftTable.isSnapshotIdString(v) => v.toLong
    case Some(v) => table.refs.getOrElse(v,
      throw new IllegalArgumentException(
        s"no tag or branch '$v' on ${table.location} — known tags: " +
          s"${table.refs.keys.toSeq.sorted.mkString(", ")}; branches: " +
          s"${table.branches.keys.toSeq.sorted.mkString(", ")}"))
    case None =>
      val e = tsExpr.getOrElse(throw new IllegalArgumentException(
        "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
      require(e.foldable, s"TIMESTAMP AS OF must be a literal, got ${e.sql}")
      val micros = Cast(e, TimestampType, Some("UTC")).eval(null)
      require(micros != null, s"cannot read ${e.sql} as a timestamp")
      val cutoffMs = Math.floorDiv(micros.asInstanceOf[Long], 1000L)
      val at = table.snapshots.takeWhile(_.timestampMs <= cutoffMs)
      require(at.nonEmpty,
        s"no snapshot of ${table.location} at or before ${e.sql}")
      at.last.snapshotId
  }

  /** `t.history` / `t.snapshots` / `t.files` / `t.partitions` /
    * `t.delete_files`: the Iceberg metadata-table
    * naming — resolves to the matching metadata view of catalog table
    * `t`, unless the two-part name is a REAL catalog table (a genuine
    * `db.table` always wins). */
  private def metadataTable(u: UnresolvedRelation): Option[LogicalPlan] = {
    val parts = u.multipartIdentifier
    if (parts.size != 2) return None
    val meta = parts(1).toLowerCase(java.util.Locale.ROOT)
    if (!Set("history", "snapshots", "files", "partitions",
        "delete_files").contains(meta))
      return None
    val catalog = spark.sessionState.catalog
    // a real db.table of this name shadows the metadata view
    if (catalog.tableExists(TableIdentifier(parts(1), Some(parts(0)))))
      return None
    val baseIdent = TableIdentifier(parts.head)
    if (!catalog.tableExists(baseIdent)) return None
    val m = catalog.getTableMetadata(baseIdent)
    if (!m.provider.exists(_.equalsIgnoreCase("graft"))) return None
    val path = m.storage.properties.get("path")
      .orElse(m.storage.locationUri.map(_.toString)).getOrElse(return None)
    val t = GraftTable(spark, path)
    val df = meta match {
      case "history" => t.history
      case "snapshots" => t.metaSnapshots
      case "files" => t.metaFiles
      case "partitions" => t.metaPartitions
      case "delete_files" => t.metaDeletes
    }
    Some(df.queryExecution.analyzed)
  }

  // each case resolves catalog metadata ONCE (a guard + .get doubles
  // the lookups — and metadataTable builds a whole metadata DataFrame)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case rt @ RelationTimeTravel(u: UnresolvedRelation, tsExpr, version) =>
      graftPath(u) match {
        case None => rt
        case Some(path) =>
          val table = GraftTable(spark, path)
          val rel = new graft.sources.GraftDataSource().createRelation(
            spark.sqlContext,
            Map("path" -> path) ++ travelOptions(table, tsExpr, version))
          LogicalRelation(rel, isStreaming = false)
      }

    case u: UnresolvedRelation => metadataTable(u).getOrElse(u)
  }
}
