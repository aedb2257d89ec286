package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.lake.LakeV2Table

/** Metadata-only `count(*)` over a lake table: the transaction log
  * already records each file's exact row count
  * (`LakeTable.footerStats`' reserved `#rows` entry), so a bare
  * `SELECT count(*) FROM lake.ns.t [VERSION AS OF v]` needs no scan at
  * all — this rule folds it to a [[LocalRelation]] holding the sum, the
  * same trick Delta's OptimizeMetadataOnlyDeltaQuery plays. Guarded
  * hard: only ungrouped, unfiltered, non-DISTINCT `count(literal)`
  * aggregates directly over the relation (a row-preserving Project in
  * between is fine) fold; any entry without a recorded count or with a
  * deletion vector makes [[LakeV2Table.logRowCount]] return None and
  * the plan is left untouched. The snapshot's file list is pinned at
  * load, so the folded count is exactly what the scan would have
  * counted — including under time travel. */
object LakeCountStarRule extends Rule[LogicalPlan] {

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), Complete,
        false, None, _), _) => v != null
    case _ => false
  }

  /** The lake relation under the aggregate, looking through
    * row-preserving projections only (a Filter would change the count).
    * Both relation forms appear: `DataSourceV2Relation` before scan
    * planning, `DataSourceV2ScanRelation` after V2ScanRelationPushDown
    * (user rules run after it) — but a ScanRelation folds only if NO
    * data filter was pushed into its scan (a pushed filter changes the
    * count the scan would produce). */
  private def lakeTable(plan: LogicalPlan): Option[LakeV2Table] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: LakeV2Table => Some(t)
      case _ => None
    }
    case s: DataSourceV2ScanRelation => (s.relation.table, s.scan) match {
      case (t: LakeV2Table,
          sc: org.apache.spark.sql.execution.datasources.v2.FileScan)
          if sc.partitionFilters.isEmpty && sc.dataFilters.isEmpty => Some(t)
      case _ => None
    }
    case Project(_, child) => lakeTable(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountStar) =>
      lakeTable(child).flatMap(_.logRowCount) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(Seq.fill(aggExprs.size)(n))))
        case None => agg
      }
  }
}
