package graft.sql

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CaseWhen, Coalesce, EqualTo, Expression, In, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.{AlterTableAddColumnsCommand, AlterTableSetPropertiesCommand, AlterTableUnsetPropertiesCommand, LeafRunnableCommand}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InsertIntoHadoopFsRelationCommand, LogicalRelation}
import org.apache.spark.sql.graftglue.GraftSqlGlue
import org.apache.spark.sql.types.StringType

import graft.sources.GraftFileIndex
import graft.table.GraftTable

/** SQL `INSERT INTO <graft table>`, routed through the snapshot log.
  * Spark's generic path (InsertIntoHadoopFsRelationCommand) would write
  * parquet straight into the table directory with NO snapshot commit —
  * rows invisible to readers and swept by the orphan collector — so
  * [[GraftSqlRule]] swaps that command for this one, which appends (or
  * overwrites) through [[GraftTable]] with full commit semantics. The
  * inbound query already carries PreprocessTableInsertion's casts and
  * column alignment; `outputColumnNames` restores table column names. */
case class GraftInsertCommand(location: String, query: LogicalPlan,
    outputColumnNames: Seq[String], overwrite: Boolean,
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val table = GraftTable(spark, location)
    val df = GraftSqlGlue.ofRows(spark, query).toDF(outputColumnNames: _*)
    if (overwrite) table.overwrite(df) else table.append(df)
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}

/** SQL `MERGE INTO <graft table>` — the statement the reference executes
  * for its bronze→silver upsert (/root/reference/bronze-silver.py:249-286):
  *
  *   MERGE INTO t USING s ON t.k = s.k [AND ...]
  *   [WHEN MATCHED AND s.op IN (...) THEN DELETE]   -- CDC extension
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *
  * Executes through [[GraftTable.merge]] (COW/MOR/auto per the
  * `graft.merge.mode` table property). The source is expected unique per
  * key, as ANSI MERGE requires; duplicate keys resolve deterministically
  * keep-one rather than erroring. With the DELETE branch, an unmatched
  * delete-op row is dropped (CDC semantics), not inserted. */
case class GraftMergeCommand(location: String, source: LogicalPlan,
    keys: Seq[String], opCol: Option[String], deleteOps: Seq[String],
    refreshIdent: Option[TableIdentifier],
    // column-level UPDATE SET assignments (None = full-row replace):
    // target column name -> expression whose attributes are name-based
    // (plain = matched TARGET row, MergeInto.SrcPrefix'd = source row),
    // re-resolved at run time against the merge's matched-rows join
    updateSet: Option[Seq[(String, ExprBox)]] = None,
    // WHEN NOT MATCHED BY SOURCE THEN DELETE (snapshot sync — one
    // overwrite commit; see MergeInto.merge)
    syncDelete: Boolean = false,
    // WHEN MATCHED AND <cond> THEN UPDATE — name-based like updateSet
    updateCond: Option[ExprBox] = None,
    // residual ANSI clause shapes, compiled first-match-wins by
    // GraftSqlRule (see MergeInto.MergeExtras for evaluation frames):
    // general WHEN MATCHED THEN DELETE
    deleteCond: Option[ExprBox] = None,
    // WHEN NOT MATCHED AND cond / column-level INSERT (plain src names)
    insertCond: Option[ExprBox] = None,
    insertSet: Option[Seq[(String, ExprBox)]] = None,
    // conditional WHEN NOT MATCHED BY SOURCE DELETE / UPDATE
    bySourceDeleteCond: Option[ExprBox] = None,
    bySourceUpdateCond: Option[ExprBox] = None,
    bySourceUpdateSet: Seq[(String, ExprBox)] = Seq.empty)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val table = GraftTable(spark, location)
    val src = GraftSqlGlue.ofRows(spark, source)
    val mode = table.properties.getOrElse("graft.merge.mode", "cow")
    def c(b: ExprBox) = GraftSqlGlue.column(b.e)
    table.merge(src, keys = keys, dedupKey = keys, orderCol = keys.head,
      opCol = opCol, deleteOps = deleteOps, mode = mode,
      updateSet = updateSet.map(_.map { case (k, b) => k -> c(b) }),
      syncDelete = syncDelete,
      updateCond = updateCond.map(c),
      extras = graft.table.MergeInto.MergeExtras(
        deleteCond = deleteCond.map(c),
        insertCond = insertCond.map(c),
        insertSet = insertSet.map(_.map { case (k, b) => k -> c(b) }),
        bySourceDeleteCond = bySourceDeleteCond.map(c),
        bySourceUpdateCond = bySourceUpdateCond.map(c),
        bySourceUpdateSet = bySourceUpdateSet.map {
          case (k, b) => k -> c(b) }))
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}

/** Opaque expression holder: keeps a name-based (deliberately
  * unresolved) expression OUT of the command's visible expression set —
  * CheckAnalysis would otherwise reject the plan for carrying unresolved
  * attributes that only re-resolve against the command's fresh table
  * scan at run time. */
case class ExprBox(e: Expression)

/** SQL `DELETE FROM <graft table> WHERE ...` — copy-on-write rewrite of
  * only the files containing matching rows ([[GraftTable.delete]]). The
  * condition is stored with name-based attributes and re-resolved against
  * the table's fresh scan at run time. */
case class GraftDeleteCommand(location: String, condition: ExprBox,
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable(spark, location).delete(GraftSqlGlue.column(condition.e))
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}

/** SQL `UPDATE <graft table> SET ... [WHERE ...]` — file-bounded COW
  * rewrite applying the assignments to matching rows
  * ([[GraftTable.update]]). */
case class GraftUpdateCommand(location: String,
    set: Seq[(String, ExprBox)], condition: Option[ExprBox],
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable(spark, location).update(
      set.map { case (k, v) => k -> GraftSqlGlue.column(v.e) }.toMap,
      condition.map(b => GraftSqlGlue.column(b.e)))
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}

/** Shared helper: after a schema-changing commit, re-point the session
  * catalog's stored table schema at the table's new schema (a v1
  * datasource binding pins the schema recorded at registration — a
  * stale one fails relation re-resolution). */
private[sql] object CatalogSync {
  def schema(spark: SparkSession, ident: TableIdentifier,
      location: String): Unit = {
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(ident)
    // store the RELAXED (all-nullable) form — the one the relation
    // reports — or re-resolution fails the user-specified-schema check
    cat.alterTable(meta.copy(schema =
      graft.sources.GraftDataSource.relaxNullability(
        GraftTable(spark, location).schema)))
    cat.refreshTable(ident)
  }
}

/** SQL `TRUNCATE TABLE <graft table>` — one snapshot-log commit
  * removing every live file ([[GraftTable.truncate]]). Spark's builtin
  * TruncateTableCommand would DELETE THE TABLE DIRECTORY, snapshot log
  * included — data loss, not a commit — so the rule must intercept. */
case class GraftTruncateCommand(location: String,
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable(spark, location).truncate()
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}

/** SQL `ALTER TABLE <graft table> ADD COLUMNS (...)` — a zero-file
  * "evolve" commit through the snapshot log ([[GraftTable.addColumns]]);
  * Spark's v1 command would reject the graft provider outright. */
case class GraftAddColumnsCommand(location: String,
    cols: Seq[org.apache.spark.sql.types.StructField],
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable(spark, location).addColumns(cols)
    refreshIdent.foreach(CatalogSync.schema(spark, _, location))
    Seq.empty
  }
}

/** SQL `ALTER TABLE <graft table> DROP COLUMN[S] ...` — zero-file
  * "evolve" commit ([[GraftTable.dropColumns]]); v1 session-catalog
  * tables have no DROP COLUMN at all (v2-only), so this is intercepted
  * before resolution refuses it. */
case class GraftDropColumnsCommand(location: String, names: Seq[String],
    ifExists: Boolean,
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable(spark, location).dropColumns(names, ifExists)
    refreshIdent.foreach(CatalogSync.schema(spark, _, location))
    Seq.empty
  }
}

/** SQL `ALTER TABLE <graft table> RENAME COLUMN old TO new` — a
  * zero-file evolve commit via [[GraftTable.renameColumn]]; legal only
  * on tables born with field ids (reads resolve files by parquet field
  * id, so files written under the old name keep their column). */
case class GraftRenameColumnCommand(location: String, oldName: String,
    newName: String,
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftTable(spark, location).renameColumn(oldName, newName)
    refreshIdent.foreach(CatalogSync.schema(spark, _, location))
    Seq.empty
  }
}

/** SQL `ALTER TABLE <graft table> ALTER COLUMN c TYPE <wider>` —
  * Iceberg type promotion via [[GraftTable.widenColumn]] (zero-file
  * evolve commit; Spark's parquet reader upcasts old files natively). */
case class GraftWidenColumnCommand(location: String,
    widens: Seq[(String, org.apache.spark.sql.types.DataType)],
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable(spark, location)
    widens.foreach { case (c, dt) => t.widenColumn(c, dt) }
    refreshIdent.foreach(CatalogSync.schema(spark, _, location))
    Seq.empty
  }
}

/** SQL `ALTER TABLE <graft table> SET/UNSET TBLPROPERTIES` — properties
  * live in the snapshot log (they gate engine behavior: merge mode,
  * Bloom columns), not in the session catalog, so the statement commits
  * a "set-properties" snapshot. */
case class GraftSetPropertiesCommand(location: String,
    set: Map[String, String], unset: Seq[String],
    refreshIdent: Option[TableIdentifier]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable(spark, location)
    // graft.ref.* carries snapshot ids ([[GraftTable.refs]]) — refuse
    // garbage here rather than letting a raw property set plant a
    // never-resolvable tag
    if (set.keys.exists(_.startsWith("graft.ref."))) {
      val ids = t.snapshots.map(_.snapshotId).toSet
      set.foreach { case (k, v) =>
        if (k.startsWith("graft.ref."))
          require(GraftTable.isSnapshotIdString(v) && ids(v.toLong),
            s"$k must name an existing snapshot id, got '$v' — use " +
              "tag()/CALL or a valid id")
      }
    }
    if (set.nonEmpty) t.setProperties(set) else t.unsetProperties(unset)
    refreshIdent.foreach(spark.sessionState.catalog.refreshTable)
    Seq.empty
  }
}

/** SQL `SHOW TBLPROPERTIES <graft table>` — serves the SNAPSHOT LOG's
  * properties (the ones that gate engine behavior), not the session
  * catalog's registration-time copy. Preserves the builtin command's
  * output shape, including single-key lookup. */
case class GraftShowPropertiesCommand(location: String,
    propertyKey: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val props = GraftTable(spark, location).properties
    propertyKey match {
      case Some(k) =>
        val v = props.getOrElse(k,
          s"Table $location does not have property: $k")
        if (output.size == 2) Seq(Row(k, v)) else Seq(Row(v))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** Post-hoc resolution rule converting SQL writes against graft tables
  * into snapshot-log commands (and refusing shapes that would bypass the
  * log). Injected by [[graft.GraftExtensions]]. */
class GraftSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"$what is not supported on graft tables; supported SQL writes are " +
        "INSERT INTO/OVERWRITE <name> SELECT ..., and MERGE INTO <name> t " +
        "USING <src> s ON t.k = s.k [WHEN MATCHED AND s.op IN (...) THEN " +
        "DELETE] WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN " +
        "INSERT *")

  /** Unwrap a MERGE target down to its graft relation, if any. */
  private def graftTarget(p: LogicalPlan)
      : Option[(GraftFileIndex, Option[TableIdentifier])] = p match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftFileIndex =>
          Some((g, lr.catalogTable.map(_.identifier)))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** ON t.k = s.k AND ... → merge key names (target attr and source attr
    * must carry the same name — graft merges join by name). */
  private def mergeKeys(m: MergeIntoTable): Seq[String] = {
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if (tOut.contains(a) && sOut.contains(b)) ||
            (tOut.contains(b) && sOut.contains(a)) =>
        if (!a.name.equalsIgnoreCase(b.name))
          unsupported(s"MERGE ON ${a.name} = ${b.name} (differing key names)")
        a.name
      case other => unsupported(s"MERGE ON condition `${other.sql}`")
    }
  }

  /** A full-row assignment set (the analyzed form of UPDATE SET * /
    * INSERT *): every value is a bare attribute with the same name as
    * its target column. `requireSide` (when given) additionally pins
    * which relation the value must come from — an UPDATE whose values
    * were analyzer-aligned with TARGET attributes for unassigned
    * columns must NOT be mistaken for a full-row SOURCE replace. */
  private def isFullRow(assignments: Seq[Assignment],
      requireSide: Option[
        org.apache.spark.sql.catalyst.expressions.AttributeSet] = None)
      : Boolean =
    assignments.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name.equalsIgnoreCase(v.name) &&
          requireSide.forall(_.contains(v))
      case _ => false
    }

  /** WHEN MATCHED AND <cond> THEN DELETE in the CDC fast-path shape
    * (source op column = string literal(s)) → (opCol, deleteOps). The
    * shape matters for performance, not just familiarity: the opCol path
    * evaluates on the SOURCE frame alone, keeping pure-MOR merges
    * read-free, where the general `deleteCond` forces the matched join. */
  private def cdcDeleteSpec(m: MergeIntoTable,
      cond: Expression): Option[(String, Seq[String])] = {
    val sOut = m.sourceTable.outputSet
    cond match {
      case EqualTo(a: AttributeReference, Literal(v, StringType))
          if sOut.contains(a) => Some((a.name, Seq(v.toString)))
      case EqualTo(Literal(v, StringType), a: AttributeReference)
          if sOut.contains(a) => Some((a.name, Seq(v.toString)))
      case In(a: AttributeReference, vs)
          if sOut.contains(a) && vs.forall {
            case Literal(_, StringType) => true; case _ => false } =>
        Some((a.name, vs.map(_.asInstanceOf[Literal].value.toString)))
      case _ => None
    }
  }

  /** First-match-wins compilation (SQL evaluates WHEN clauses in order):
    * clause i's EFFECTIVE condition = its own condition AND NOT(any
    * earlier clause fired), where "fired" null-coalesces to false so an
    * earlier NULL condition cannot poison later clauses. The effective
    * conditions are mutually exclusive by construction, so the engine may
    * apply the compiled delete/update actions in either order. */
  private def effConds(conds: Seq[Option[Expression]]): Seq[Expression] = {
    val fired = conds.map(c => Coalesce(Seq(
      c.getOrElse(Literal.TrueLiteral), Literal.FalseLiteral)))
    conds.zipWithIndex.map { case (c, i) =>
      val own = c.getOrElse(Literal.TrueLiteral)
      if (i == 0) own else And(own, Not(fired.take(i).reduce(Or)))
    }
  }

  private def toMergeCommand(m: MergeIntoTable,
      g: GraftFileIndex, ident: Option[TableIdentifier]): LogicalPlan = {
    val keys = mergeKeys(m)
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    val tCols = m.targetTable.output.map(_.name)

    // ---- legacy fast-path shapes (kept verbatim: the opCol CDC delete
    // keeps pure-MOR merges read-free, and bare shapes skip the join) ----
    def isLegacyUpdate(a: MergeAction): Boolean = a match {
      case UpdateStarAction(_) => true
      case UpdateAction(_, _, _) => true
      case _ => false
    }
    val legacyBySource = m.notMatchedBySourceActions match {
      case Seq() | Seq(DeleteAction(None)) => true
      case _ => false
    }
    val legacyInsert = m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, assigns)) =>
        isFullRow(assigns, Some(sOut))
      case _ => false
    }
    val legacyMatched = m.matchedActions match {
      case Seq(DeleteAction(Some(cond)), rest @ _*) =>
        cdcDeleteSpec(m, cond).isDefined && rest.size == 1 &&
          isLegacyUpdate(rest.head)
      case Seq(u) => isLegacyUpdate(u)
      case _ => false
    }
    if (legacyBySource && legacyInsert && legacyMatched)
      return toLegacyMergeCommand(m, g, ident)
    toGeneralMergeCommand(m, g, ident)
  }

  private def toLegacyMergeCommand(m: MergeIntoTable,
      g: GraftFileIndex, ident: Option[TableIdentifier]): LogicalPlan = {
    val syncDelete = m.notMatchedBySourceActions match {
      case Seq() => false
      case Seq(DeleteAction(None)) => true // snapshot-sync delete
      case _ => unsupported(
        "this WHEN NOT MATCHED BY SOURCE shape (only a bare DELETE)")
    }
    val keys = mergeKeys(m)

    // matched: optional leading DELETE (must precede the update — SQL
    // evaluates WHEN clauses in order, so a delete after an unconditional
    // update would be dead), then exactly one full-row update
    val (opCol, deleteOps, updates) = m.matchedActions match {
      case Seq(DeleteAction(Some(cond)), rest @ _*) =>
        val (oc, ops) = cdcDeleteSpec(m, cond).getOrElse(
          unsupported(s"MERGE delete condition `${cond.sql}`"))
        (Some(oc), ops, rest)
      case other => (None, Seq.empty[String], other)
    }
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    // column-level assignments: keep the analyzed expression but swap
    // its attribute references for NAME-BASED ones tagged by side, so
    // the command can re-resolve them against its run-time matched-rows
    // join (target columns plain, source columns SrcPrefix'd — the
    // frame MergeInto.upsertRows evaluates assignments over)
    def nameBased(v: Expression): Expression = v.transform {
      case a: AttributeReference if sOut.contains(a) =>
        // merge keys stay under their plain shared names in the join
        // frame (and the ON condition makes the sides equal anyway)
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(
          if (keys.exists(_.equalsIgnoreCase(a.name))) a.name
          else graft.table.MergeInto.SrcPrefix + a.name))
      case a: AttributeReference if tOut.contains(a) =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
          Seq(a.name))
    }
    def assignSet(assigns: Seq[Assignment])
        : Option[Seq[(String, ExprBox)]] =
      if (isFullRow(assigns, Some(sOut))) None
      else Some(assigns.flatMap { a =>
        val k = a.key match {
          case ar: AttributeReference => ar
          case other => unsupported(
            s"MERGE UPDATE SET key `${other.sql}` (need a column)")
        }
        require(tOut.contains(k),
          s"MERGE UPDATE SET must assign a target column, got ${k.name}")
        a.value match {
          // identity target assignment (k = t.k): an analyzer-aligned
          // no-op for an unassigned column — unassigned columns keep
          // the target value anyway
          case v: AttributeReference
              if tOut.contains(v) && v.name.equalsIgnoreCase(k.name) =>
            None
          case v => Some(k.name -> ExprBox(nameBased(v)))
        }
      })
    val (updateSet, updateCond)
        : (Option[Seq[(String, ExprBox)]], Option[ExprBox]) =
      updates match {
        case Seq(UpdateStarAction(None)) => (None, None)
        case Seq(UpdateStarAction(Some(cond))) =>
          (None, Some(ExprBox(nameBased(cond))))
        case Seq(UpdateAction(cond, assigns, _)) =>
          (assignSet(assigns), cond.map(c => ExprBox(nameBased(c))))
        case Seq() => unsupported(
          "MERGE without a WHEN MATCHED update clause")
        case _ => unsupported(
          "this WHEN MATCHED shape (one UPDATE clause, optionally " +
            "conditional, optionally preceded by a DELETE)")
      }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case Seq(InsertAction(None, assigns))
          if isFullRow(assigns, Some(sOut)) => ()
      case _ => unsupported("this WHEN NOT MATCHED shape (need INSERT *)")
    }
    GraftMergeCommand(g.table.location, m.sourceTable, keys, opCol,
      deleteOps, ident, updateSet, syncDelete, updateCond)
  }

  /** The GENERAL ANSI MERGE compiler — any number of WHEN MATCHED /
    * NOT MATCHED / NOT MATCHED BY SOURCE clauses, each optionally
    * conditional, UPDATE (full or column-level) / DELETE / INSERT (star
    * or column-level), evaluated with SQL's first-match-wins ordering.
    * Multiple clauses compile into SINGLE engine primitives: mutually
    * exclusive effective conditions ([[effConds]]) whose actions fold
    * into per-column CASE expressions, so [[graft.table.MergeInto]]
    * applies the whole matrix in one matched-join pass — no per-clause
    * scans, no unions of the join. */
  private def toGeneralMergeCommand(m: MergeIntoTable,
      g: GraftFileIndex, ident: Option[TableIdentifier]): LogicalPlan = {
    val keys = mergeKeys(m)
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    val tCols = m.targetTable.output.map(_.name)
    def ua(n: String) =
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n))

    // join-frame mapping: target plain, source SrcPrefix'd — except the
    // merge keys, which the join keeps under their plain (shared) names
    // and the ON condition makes equal on both sides anyway
    def nameBased(v: Expression): Expression = v.transform {
      case a: AttributeReference if sOut.contains(a) =>
        if (keys.exists(_.equalsIgnoreCase(a.name))) ua(a.name)
        else ua(graft.table.MergeInto.SrcPrefix + a.name)
      case a: AttributeReference if tOut.contains(a) => ua(a.name)
    }
    // source-frame mapping (NOT MATCHED clauses): plain source names
    def sourceOnly(v: Expression, where: String): Expression = v.transform {
      case a: AttributeReference if sOut.contains(a) => ua(a.name)
      case a: AttributeReference if tOut.contains(a) => unsupported(
        s"$where may reference only SOURCE columns, got target ${a.name}")
    }
    // target-frame mapping (NOT MATCHED BY SOURCE clauses)
    def targetOnly(v: Expression, where: String): Expression = v.transform {
      case a: AttributeReference if tOut.contains(a) => ua(a.name)
      case a: AttributeReference if sOut.contains(a) => unsupported(
        s"$where may reference only TARGET columns, got source ${a.name}")
    }
    def condOf(a: MergeAction): Option[Expression] = a.condition
    def assignPairs(assigns: Seq[Assignment], where: String)
        : Seq[(String, Expression)] = assigns.map { a =>
      val k = a.key match {
        case ar: AttributeReference => ar
        case other => unsupported(
          s"$where SET key `${other.sql}` (need a column)")
      }
      require(tOut.contains(k),
        s"$where must assign a target column, got ${k.name}")
      k.name -> a.value
    }

    // ---- WHEN MATCHED: updates + deletes, first-match-wins ----
    val mEffs = effConds(m.matchedActions.map(condOf))
    val deleteEffs = mEffs.zip(m.matchedActions).collect {
      case (e, DeleteAction(_)) => e }
    // (eff, column -> raw value) per update clause; star = all non-key
    // columns from the source row by name
    val updatePairs: Seq[(Expression, Seq[(String, Expression)])] =
      mEffs.zip(m.matchedActions).collect {
        case (e, UpdateStarAction(_)) =>
          e -> tCols.filterNot(keys.contains).map(c =>
            c -> (ua(graft.table.MergeInto.SrcPrefix + c): Expression))
        case (e, UpdateAction(_, assigns, _)) =>
          e -> assignPairs(assigns, "MERGE UPDATE").flatMap {
            // merge-key assignment: the analyzer's SET * expansion emits
            // k = s.k, which the ON condition makes an identity — drop;
            // any OTHER key reassignment has no engine meaning
            case (k2, v: AttributeReference)
                if keys.contains(k2) && v.name.equalsIgnoreCase(k2) &&
                  (sOut.contains(v) || tOut.contains(v)) => None
            case (k2, _) if keys.contains(k2) => unsupported(
              s"MERGE UPDATE may not reassign merge key `$k2`")
            // identity no-op (c = t.c): the effective conditions are
            // mutually exclusive, so a row matching this clause falls to
            // the ELSE target value — identical outcome
            case (k2, v: AttributeReference)
                if tOut.contains(v) && v.name.equalsIgnoreCase(k2) => None
            case pair => Some(pair)
          }
      }
    m.matchedActions.foreach {
      case _: DeleteAction | _: UpdateAction | _: UpdateStarAction => ()
      case other => unsupported(s"WHEN MATCHED action `$other`")
    }
    val deleteCond = deleteEffs.reduceOption(Or)
      .map(e => ExprBox(nameBased(e)))
    // updateCond: OR of update effs; a merge with NO update clause keeps
    // matched rows untouched — compiled as literal false
    val updateCond: Option[ExprBox] =
      if (updatePairs.isEmpty) Some(ExprBox(Literal.FalseLiteral))
      else Some(ExprBox(nameBased(updatePairs.map(_._1).reduce(Or))))
    // per-column CASE across update clauses; ELSE = keep target value
    val assignedCols = updatePairs.flatMap(_._2.map(_._1)).distinct
    val updateSet: Option[Seq[(String, ExprBox)]] =
      if (assignedCols.isEmpty) None
      else Some(assignedCols.map { c =>
        val branches = updatePairs.collect {
          case (e, as) if as.exists(_._1 == c) =>
            (nameBased(Coalesce(Seq(e, Literal.FalseLiteral))),
              nameBased(as.find(_._1 == c).get._2))
        }
        c -> ExprBox(CaseWhen(branches, Some(ua(c))))
      })

    // ---- WHEN NOT MATCHED: inserts, first-match-wins ----
    val (insertCond, insertSet): (Option[ExprBox],
        Option[Seq[(String, ExprBox)]]) = m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => (None, None)
      case Seq(InsertAction(None, assigns))
          if isFullRow(assigns, Some(sOut)) => (None, None)
      case Seq() => // no insert clause: not-matched source rows drop
        (Some(ExprBox(Literal.FalseLiteral)), None)
      case actions =>
        val effs = effConds(actions.map(condOf))
        val perClause: Seq[Map[String, Expression]] = actions.map {
          case InsertStarAction(_) =>
            tCols.map(c => c -> (ua(c): Expression)).toMap
          case InsertAction(_, assigns) =>
            assignPairs(assigns, "MERGE INSERT").toMap
          case other => unsupported(s"WHEN NOT MATCHED action `$other`")
        }
        val set = tCols.flatMap { c =>
          val branches = effs.zip(perClause).collect {
            case (e, as) if as.contains(c) =>
              (sourceOnly(Coalesce(Seq(e, Literal.FalseLiteral)),
                "MERGE INSERT condition"),
                sourceOnly(as(c), "MERGE INSERT value"))
          }
          // a column no clause assigns inserts NULL (engine default)
          if (branches.isEmpty) None
          else Some(c -> ExprBox(CaseWhen(branches, None)))
        }
        (Some(ExprBox(sourceOnly(effs.reduce(Or),
          "MERGE INSERT condition"))), Some(set))
    }

    // ---- WHEN NOT MATCHED BY SOURCE: target-only rows ----
    val (syncDelete, bsDelete, bsUpdateCond, bsUpdateSet) =
      m.notMatchedBySourceActions match {
        case Seq() => (false, None, None, Seq.empty[(String, ExprBox)])
        case Seq(DeleteAction(None)) =>
          (true, None, None, Seq.empty[(String, ExprBox)])
        case actions =>
          val effs = effConds(actions.map(condOf))
          val delEffs = effs.zip(actions).collect {
            case (e, DeleteAction(_)) => e }
          val updPairs = effs.zip(actions).collect {
            case (e, UpdateAction(_, assigns, _)) =>
              e -> assignPairs(assigns, "MERGE BY SOURCE UPDATE")
          }
          actions.foreach {
            case _: DeleteAction | _: UpdateAction => ()
            case other => unsupported(
              s"WHEN NOT MATCHED BY SOURCE action `$other` " +
                "(UPDATE SET or DELETE — there is no source row)")
          }
          def tgt(e: Expression) =
            targetOnly(e, "WHEN NOT MATCHED BY SOURCE")
          val del = delEffs.reduceOption(Or).map(e => ExprBox(tgt(e)))
          val updCond = updPairs.map(_._1).reduceOption(Or)
            .map(e => ExprBox(tgt(e)))
          val assigned = updPairs.flatMap(_._2.map(_._1)).distinct
          val updSet = assigned.map { c2 =>
            val branches = updPairs.collect {
              case (e, as) if as.exists(_._1 == c2) =>
                (tgt(Coalesce(Seq(e, Literal.FalseLiteral))),
                  tgt(as.find(_._1 == c2).get._2))
            }
            c2 -> ExprBox(CaseWhen(branches, Some(ua(c2))))
          }
          (false, del, updCond, updSet)
      }

    GraftMergeCommand(g.table.location, m.sourceTable, keys,
      opCol = None, deleteOps = Seq.empty, refreshIdent = ident,
      updateSet = updateSet, syncDelete = syncDelete,
      updateCond = updateCond, deleteCond = deleteCond,
      insertCond = insertCond, insertSet = insertSet,
      bySourceDeleteCond = bsDelete, bySourceUpdateCond = bsUpdateCond,
      bySourceUpdateSet = bsUpdateSet)
  }

  /** Table path when `ident` is a catalog-registered graft table. */
  private def graftLoc(ident: TableIdentifier): Option[String] = {
    val cat = spark.sessionState.catalog
    if (!cat.tableExists(ident)) return None
    val m = cat.getTableMetadata(ident)
    if (!m.provider.exists(_.equalsIgnoreCase("graft"))) return None
    m.storage.properties.get("path")
      .orElse(m.storage.locationUri.map(_.toString))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // DataSourceAnalysis (a built-in post-hoc rule that runs before this
    // one) has already converted INSERT over our relation into the
    // HadoopFsRelation command — swap it for the snapshot-log commit
    case c: InsertIntoHadoopFsRelationCommand
        if c.fileIndex.exists(_.isInstanceOf[GraftFileIndex]) =>
      val g = c.fileIndex.get.asInstanceOf[GraftFileIndex]
      if (c.staticPartitions.nonEmpty)
        unsupported("partition-spec INSERT (partitioning is table-level)")
      GraftInsertCommand(g.table.location, c.query, c.outputColumnNames,
        c.mode == SaveMode.Overwrite, c.catalogTable.map(_.identifier))

    case m: MergeIntoTable if m.childrenResolved &&
        graftTarget(m.targetTable).isDefined =>
      val (g, ident) = graftTarget(m.targetTable).get
      toMergeCommand(m, g, ident)

    case d: DeleteFromTable if d.table.resolved &&
        graftTarget(d.table).isDefined =>
      val (g, ident) = graftTarget(d.table).get
      GraftDeleteCommand(g.table.location, ExprBox(nameBased(d.condition)),
        ident)

    case u: UpdateTable if u.table.resolved &&
        graftTarget(u.table).isDefined =>
      val (g, ident) = graftTarget(u.table).get
      val set = u.assignments.map {
        case Assignment(k: AttributeReference, v) =>
          k.name -> ExprBox(nameBased(v))
        case other => unsupported(s"UPDATE assignment `${other.sql}`")
      }
      GraftUpdateCommand(g.table.location, set,
        u.condition.map(c => ExprBox(nameBased(c))), ident)

    // TRUNCATE TABLE resolves to the v1 command, whose run() would rm
    // the TABLE DIRECTORY (snapshot log included) — swap for the
    // history-preserving zero-file commit
    case tc: org.apache.spark.sql.execution.command.TruncateTableCommand
        if graftLoc(tc.tableName).isDefined =>
      if (tc.partitionSpec.nonEmpty)
        unsupported("TRUNCATE with a partition spec")
      GraftTruncateCommand(graftLoc(tc.tableName).get, Some(tc.tableName))

    // ALTER TABLE ADD COLUMNS resolves to the v1 command (whose run()
    // would reject the graft provider) — swap for the evolve commit
    case a: AlterTableAddColumnsCommand if graftLoc(a.table).isDefined =>
      GraftAddColumnsCommand(graftLoc(a.table).get, a.colsToAdd,
        Some(a.table))

    case s: AlterTableSetPropertiesCommand
        if !s.isView && graftLoc(s.tableName).isDefined =>
      GraftSetPropertiesCommand(graftLoc(s.tableName).get, s.properties,
        Seq.empty, Some(s.tableName))

    case u: AlterTableUnsetPropertiesCommand
        if !u.isView && graftLoc(u.tableName).isDefined =>
      GraftSetPropertiesCommand(graftLoc(u.tableName).get, Map.empty,
        u.propKeys, Some(u.tableName))

    // SHOW TBLPROPERTIES stays a v2 plan (ResolvedTable over V1Table)
    // even for session-catalog tables — swap it for the snapshot-log
    // read. Guarded to the SESSION catalog with a plain namespace: a
    // same-named table in another v2 catalog (or a nested namespace)
    // must keep its own properties, not be shadowed by ours.
    case sp: ShowTableProperties =>
      sp.table match {
        case r: org.apache.spark.sql.catalyst.analysis.ResolvedTable
            if r.catalog.name == "spark_catalog" &&
              r.identifier.namespace.length <= 1 =>
          val ti =
            if (r.identifier.namespace.isEmpty)
              TableIdentifier(r.identifier.name)
            else TableIdentifier(r.identifier.name,
              Some(r.identifier.namespace.head))
          graftLoc(ti) match {
            case Some(loc) =>
              GraftShowPropertiesCommand(loc, sp.propertyKey, sp.output)
            case None => sp
          }
        case _ => sp
      }
  }

  /** Replace resolved attribute references with name-based ones so the
    * expression re-resolves against the command's fresh table scan (the
    * original exprIds die with this plan). */
  private def nameBased(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
        Seq(a.name))
  }
}
