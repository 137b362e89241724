package graft.sql

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, SubqueryAlias, View}
import org.apache.spark.sql.catalyst.rules.Rule

/** Metadata-only `SELECT COUNT(*)` over a REGISTERED FOREIGN Iceberg
  * tree — the reference's headline correctness check from external
  * engines (`/root/reference/README.md:121-126`,
  * `query-engine/starocks/mask.sql:25`), which Iceberg answers from
  * manifest `record_count`s. `CALL graft.register_iceberg` exposes a
  * foreign tree as a temp view over the composed MOR read; counting
  * that view would otherwise plan a full scan plus delete anti-joins.
  *
  * This rule is the foreign twin of [[GraftCountStarRule]] (which
  * fires only on graft's own [[graft.sources.GraftFileIndex]]
  * relations). The MOR composition is no bare relation, so the match
  * is by PLAN IDENTITY, not shape: `register_iceberg` records the
  * view's analyzed plan (canonicalized) with its pinned (location,
  * snapshot); the rule strips view wrappers / pass-through projections
  * under a pure global COUNT aggregate and looks the child up. It runs
  * as a POST-HOC RESOLUTION rule — at that point the child is still
  * the pristine stored view plan (the optimizer would have rewritten
  * it beyond recognition).
  *
  * The answer comes from [[graft.iceberg.IcebergImport.countExact]]:
  * manifest record_count sums minus exactly-applying position
  * tombstones (parquet position deletes + deletion vectors, distinct
  * (file, pos), metadata-scale IO only). When equality deletes are
  * live — the one case whose match set needs the data rows — or the
  * tree fails to re-plan, the rewrite declines and the honest MOR scan
  * runs. The count pins the SAME snapshot the view pinned, so commits
  * landing after registration do not leak in. */
class GraftForeignCountRule(spark: SparkSession)
    extends Rule[LogicalPlan] {
  import GraftForeignCountRule._

  private def countsOnly(exprs: Seq[NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall {
      case Alias(AggregateExpression(
        Count(Seq(Literal(v, _))), Complete, false, None, _), _) =>
        v != null
      case _ => false
    }

  /** The registry entry for `p`, looked up at EVERY unwrap level of
    * what analysis puts around a temp view — the alias, the view node,
    * pass-through projections (attributes or attribute renames). The
    * per-level probe matters: the registered plan's own top node is a
    * pass-through-shaped Project, so a fixpoint strip would descend
    * PAST the registered plan and miss it. Anything else — a Filter, a
    * real expression — ends the walk (it changes the count). */
  @annotation.tailrec
  private def lookup(p: LogicalPlan): Option[(String, Option[String])] =
    lookupExact(p.canonicalized) match {
      case some @ Some(_) => some
      case None => p match {
        case SubqueryAlias(_, child) => lookup(child)
        case v: View => lookup(v.child)
        case Project(ps, child) if ps.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case _ => false
        } => lookup(child)
        case _ => None
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if countsOnly(aggExprs) && !GraftForeignCountRule.isEmpty =>
      lookup(child).flatMap { case (location, at) =>
        try graft.iceberg.IcebergImport.countExact(spark, location, at)
        catch { case NonFatal(_) => None } // re-plan failed: scan
      }.map { n =>
        LocalRelation(agg.output.map(_.toAttribute),
          Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
      }.getOrElse(agg)
  }
}

object GraftForeignCountRule {
  /** Canonicalized registered-view plan → (table location, pinned
    * snapshot as an `at` ref). Session-shared like the temp-view
    * catalog it mirrors; re-registering a view replaces its entry.
    * BOUNDED (LRU, 128): each key retains a full analyzed plan tree,
    * so a long-lived session registering many views must not
    * accumulate them forever — evicting an old entry merely turns its
    * view's COUNT back into the honest scan. */
  private val MaxEntries = 128
  private val lru =
    new java.util.LinkedHashMap[LogicalPlan, (String, Option[String])](
      32, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, (String, Option[String])])
          : Boolean = size() > MaxEntries
    }

  private[graft] def register(viewPlan: LogicalPlan, location: String,
      at: Option[String]): Unit =
    lru.synchronized { lru.put(viewPlan.canonicalized, (location, at)) }

  private def lookupExact(key: LogicalPlan)
      : Option[(String, Option[String])] =
    lru.synchronized { Option(lru.get(key)) }
  private def isEmpty: Boolean = lru.synchronized { lru.isEmpty }
}
