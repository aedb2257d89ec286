package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.lake.LakeV2Table

/** Metadata-only aggregates over a lake table: the transaction log
  * already records each file's exact row count (`LakeTable.footerStats`'
  * reserved `#rows` entry) AND per-column min/max ranges, so a bare
  * `SELECT count(*) / min(x) / max(x) FROM lake.ns.t [VERSION AS OF v]`
  * needs no scan at all — this rule folds it to a [[LocalRelation]], the
  * same trick Delta's OptimizeMetadataOnlyDeltaQuery plays. Guarded
  * hard: only ungrouped, unfiltered, non-DISTINCT aggregates directly
  * over the relation (a row-preserving Project in between is fine)
  * fold; any entry without recorded stats or with a deletion vector
  * makes [[LakeV2Table.logRowCount]]/[[LakeV2Table.logColumnRange]]
  * return None and the plan is left untouched. min/max folds only for
  * INTEGRAL columns ([[LakeV2Table.logColumnRange]] explains the
  * float-NaN hazard). The snapshot's file list is pinned at load, so
  * folded values are exactly what the scan would have produced —
  * including under time travel. */
object LakeCountStarRule extends Rule[LogicalPlan] {

  private sealed trait Foldable
  private case object CountStar extends Foldable
  private case class MinOf(col: String) extends Foldable
  private case class MaxOf(col: String) extends Foldable

  /** Classify an aggregate output expression, resolving min/max
    * arguments through `attrs` (output-attribute → relation-column). */
  private def foldable(e: NamedExpression,
      attrs: Map[ExprId, String]): Option[Foldable] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), Complete,
        false, None, _), _) if v != null => Some(CountStar)
    case Alias(AggregateExpression(Min(a: AttributeReference), Complete,
        false, None, _), _) => attrs.get(a.exprId).map(MinOf)
    case Alias(AggregateExpression(Max(a: AttributeReference), Complete,
        false, None, _), _) => attrs.get(a.exprId).map(MaxOf)
    case _ => None
  }

  /** The lake relation under the aggregate, looking through
    * row-preserving projections only (a Filter would change every
    * foldable value). Both relation forms appear: `DataSourceV2Relation`
    * before scan planning, `DataSourceV2ScanRelation` after
    * V2ScanRelationPushDown (user rules run after it) — but a
    * ScanRelation folds only if NO data filter was pushed into its scan
    * (a pushed filter changes what the scan would produce). */
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

  /** Output-attribute exprId → underlying relation column name, through
    * rename-only projections (any computed projection drops the
    * attribute from the map, so min/max over an expression never
    * folds). */
  private def attrMap(plan: LogicalPlan): Map[ExprId, String] = plan match {
    case r: DataSourceV2Relation =>
      r.output.map(a => a.exprId -> a.name).toMap
    case s: DataSourceV2ScanRelation =>
      s.output.map(a => a.exprId -> a.name).toMap
    case Project(list, child) =>
      val base = attrMap(child)
      list.flatMap {
        case a: AttributeReference => base.get(a.exprId).map(a.exprId -> _)
        case al @ Alias(a: AttributeReference, _) =>
          base.get(a.exprId).map(al.exprId -> _)
        case _ => None
      }.toMap
    case _ => Map.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      lakeTable(child) match {
        case None => agg
        case Some(t) =>
          val attrs = attrMap(child)
          val classified = aggExprs.map(foldable(_, attrs))
          if (classified.exists(_.isEmpty)) agg
          else {
            // every aggregate must resolve from the log, or none fold
            val values = classified.flatMap(x => x).map {
              case CountStar => t.logRowCount
              case MinOf(c) => t.logColumnRange(c).map(_._1)
              case MaxOf(c) => t.logColumnRange(c).map(_._2)
            }
            if (values.exists(_.isEmpty)) agg
            else {
              // narrow each folded Long to the aggregate's output type;
              // an unexpected output type bails the whole fold
              val narrowed = values.flatMap(x => x).zip(agg.output).map {
                case (v, a) => a.dataType match {
                  case LongType => Some(v)
                  case IntegerType => Some(v.toInt)
                  case ShortType => Some(v.toShort)
                  case ByteType => Some(v.toByte)
                  case _ => None
                }
              }
              if (narrowed.exists(_.isEmpty)) agg
              else LocalRelation(agg.output,
                Seq(InternalRow.fromSeq(narrowed.flatMap(x => x))))
            }
          }
      }
  }
}
