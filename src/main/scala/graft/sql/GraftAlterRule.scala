package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
import org.apache.spark.sql.catalyst.plans.logical.{AlterColumns, DropColumns, LogicalPlan, RenameColumn}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL `ALTER TABLE ... DROP COLUMN[S]` / `RENAME COLUMN` on graft
  * catalog tables. Both statements are v2-only in Spark — the builtin
  * Resolution batch rejects them for v1 session-catalog tables before
  * any post-hoc rule could fire — so this rule runs in the HINTS batch
  * (like [[GraftTimeTravelRule]]) and converts/refuses them first:
  *
  *   - DROP COLUMN[S] → [[GraftDropColumnsCommand]], a zero-file
  *     "evolve" commit (files keep the bytes; reads project them away);
  *   - RENAME COLUMN → [[GraftRenameColumnCommand]], a zero-file
  *     "evolve" commit on tables born with field ids (reads resolve
  *     files by parquet field id, so old files keep their column);
  *     legacy name-mapped tables still refuse loudly inside
  *     [[graft.table.GraftTable.renameColumn]].
  */
class GraftAlterRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** (catalog ident, table path) when `p` names a graft catalog table. */
  private def graftIdent(p: LogicalPlan)
      : Option[(TableIdentifier, String)] = p match {
    case u: UnresolvedTable =>
      val parts = u.multipartIdentifier
      if (parts.size > 2) return None
      val ident =
        if (parts.size == 2) TableIdentifier(parts(1), Some(parts(0)))
        else TableIdentifier(parts.head)
      val cat = spark.sessionState.catalog
      if (!cat.tableExists(ident)) return None
      val m = cat.getTableMetadata(ident)
      if (!m.provider.exists(_.equalsIgnoreCase("graft"))) return None
      m.storage.properties.get("path")
        .orElse(m.storage.locationUri.map(_.toString)).map(ident -> _)
    case _ => None
  }

  // each case resolves the catalog metadata ONCE (a guard + .get would
  // double the tableExists/getTableMetadata lookups — RPCs on a real
  // metastore, and analyzer rules can run several times per query)
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case d @ DropColumns(t, cols, ifExists) => graftIdent(t) match {
      case None => d
      case Some((ident, loc)) =>
        val names = cols.map { f =>
          if (f.name.size != 1) throw new UnsupportedOperationException(
            s"DROP nested field ${f.name.mkString(".")} is not supported " +
              "on graft tables")
          f.name.head
        }
        GraftDropColumnsCommand(loc, names, ifExists, Some(ident))
    }

    case r: RenameColumn => graftIdent(r.table) match {
      case None => r
      case Some((ident, loc)) =>
        if (r.column.name.size != 1) throw new UnsupportedOperationException(
          s"RENAME nested field ${r.column.name.mkString(".")} is not " +
            "supported on graft tables")
        GraftRenameColumnCommand(loc, r.column.name.head, r.newName,
          Some(ident))
    }

    // ALTER COLUMN c TYPE <wider> → widenColumn (type promotion); any
    // other ALTER COLUMN shape (nullability, comment, position,
    // defaults) is refused explicitly
    case a: AlterColumns => graftIdent(a.table) match {
      case None => a
      case Some((ident, loc)) =>
        val widens = a.specs.map { sp =>
          if (sp.newDataType.isEmpty || sp.newNullability.nonEmpty ||
              sp.newComment.nonEmpty || sp.newPosition.nonEmpty ||
              sp.newDefaultExpression.nonEmpty || sp.dropDefault)
            throw new UnsupportedOperationException(
              "only ALTER COLUMN <c> TYPE <wider type> (type promotion) " +
                "is supported on graft tables")
          if (sp.column.name.size != 1)
            throw new UnsupportedOperationException(
              s"ALTER nested field ${sp.column.name.mkString(".")} is " +
                "not supported on graft tables")
          (sp.column.name.head, sp.newDataType.get)
        }
        GraftWidenColumnCommand(loc, widens, Some(ident))
    }
  }
}
