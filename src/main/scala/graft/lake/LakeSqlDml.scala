package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, Assignment, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, OverwriteByExpression, UpdateAction}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** SQL `INSERT INTO` and `MERGE INTO` on lake tables, completing the
  * DML verb set (DELETE via `SupportsDeleteV2`, UPDATE via
  * [[LakeSqlUpdate]], TRUNCATE, RESTORE via the CLI). Same architecture
  * as UPDATE: post-hoc resolution rules intercept the analyzed command
  * over a lake relation and replace it with a command running the
  * library transaction — the SQL surface adds ZERO new write machinery,
  * and anything outside the translatable shape refuses loudly before
  * any data is touched.
  *
  *  - `INSERT INTO lake.ns.t SELECT ...` → [[LakeTable.append]]: the
  *    analyzer has already aligned the query to the table schema by
  *    position, so the append's own schema validation sees exactly what
  *    a library caller would pass. `INSERT OVERWRITE` is refused (the
  *    lake's overwrite verbs are TRUNCATE + append, or RESTORE).
  *    `df.write.format("lake").mode("append").save(dir)` lands in the
  *    same rewrite via its `AppendData` plan — by the time this rule
  *    sees it the analyzer has resolved the write BY NAME against the
  *    table schema (reordering columns, null-filling absent nullable
  *    ones per Spark's default-value semantics), so a DataFrame append
  *    is one validated log commit too, never a bare file write.
  *    `mode("overwrite")` refuses like INSERT OVERWRITE.
  *  - `MERGE INTO lake.ns.t USING src ON t.k = s.k WHEN MATCHED THEN
  *    UPDATE SET * WHEN NOT MATCHED THEN INSERT *` →
  *    [[LakeTable.merge]] — the CDC upsert the library merge
  *    implements. Conditional actions, DELETE actions, column-subset
  *    assignments, NOT MATCHED BY SOURCE clauses, and schema evolution
  *    all refuse: each would silently change upsert semantics if
  *    half-translated.
  */
object LakeSqlInsert extends Rule[LogicalPlan] {

  private def refuseOverwrite(): Nothing =
    throw new UnsupportedOperationException(
      "lake: INSERT OVERWRITE is not a lake verb; use TRUNCATE TABLE + " +
        "INSERT INTO (two explicit commits, both time-travelable) or " +
        "RESTORE for rollback")

  /** The analyzer's FallBackFileSourceV2 converts INSERT over any
    * FileTable to the V1 path BEFORE custom rules run, erasing the
    * [[LakeV2Table]]; the [[LakeFileIndex]] inside the fallback
    * HadoopFsRelation is the surviving marker. */
  private def lakeRootOfV1(plan: LogicalPlan): Option[String] = plan match {
    case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      l.relation match {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          h.location match {
            case idx: LakeFileIndex => Some(idx.tableRoot)
            case _ => None
          }
        case _ => None
      }
    case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      lakeRootOfV1(a.child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // the V1-fallback form every INSERT over a FileTable takes. This
    // rule is injected as a RESOLUTION rule (not post-hoc): the
    // built-in DataSourceAnalysis post-hoc rule would reject the
    // multi-path V1 relation before any custom post-hoc rule ran, so
    // the rewrite must win inside the main resolution batch, right
    // after FallBackFileSourceV2 produces this shape.
    case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
        if i.query.resolved && lakeRootOfV1(i.table).isDefined =>
      if (i.overwrite) refuseOverwrite()
      if (i.partitionSpec.nonEmpty)
        throw new UnsupportedOperationException(
          "lake: INSERT with a PARTITION spec is not supported (lake " +
            "tables are clustered by layout, not hive-partitioned)")
      LakeInsertCommand(lakeRootOfV1(i.table).get, i.query)
    // DSv2 forms, in case a path produces them directly
    case a: AppendData =>
      LakeSqlUpdate.lakeOf(a.table) match {
        case None => a
        case Some(t) =>
          t.requireCurrentFor("INSERT")
          LakeInsertCommand(t.tableRoot, a.query)
      }
    case o: OverwriteByExpression if LakeSqlUpdate.lakeOf(o.table).isDefined =>
      refuseOverwrite()
  }
}

/** Runnable side of [[LakeSqlInsert]]: one append transaction. SQL
  * INSERT is positional, so the query's output columns are renamed to
  * the table schema before the append's own (name-based) validation —
  * type mismatches still refuse there. */
case class LakeInsertCommand(root: String, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftSqlBridge.ofRows(spark, query)
    val schemaJson = LakeTable.snapshotFiles(root, None)._2.getOrElse(
      throw new IllegalArgumentException(s"no such lake table: $root"))
    val names = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    require(df.columns.length == names.length,
      s"lake INSERT: query produces ${df.columns.length} columns, table " +
        s"$root has ${names.length}")
    LakeTable.append(spark, root, df.toDF(names: _*))
    Seq.empty
  }
}

object LakeSqlMerge extends Rule[LogicalPlan] {

  private def refuse(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"lake: this MERGE $why. Supported: MERGE INTO lake.ns.t USING src " +
        "ON t.key = src.key WHEN MATCHED THEN UPDATE SET * WHEN NOT " +
        "MATCHED THEN INSERT * (the CDC upsert LakeTable.merge runs); " +
        "other actions would silently change upsert semantics if " +
        "half-translated")

  /** The ON condition must be one equality between identically-named
    * key columns of the two sides. */
  private def keyOf(cond: Expression): String = cond match {
    case EqualTo(l: AttributeReference, r: AttributeReference)
        if l.name == r.name => l.name
    case _ => refuse("has an ON condition that is not a single equality " +
      "between identically-named key columns")
  }

  /** An action translates only if it is the unconditional star form:
    * every assignment `col = src.col` with matching names (a Cast in
    * the value means a type mismatch the merge would refuse anyway —
    * refuse here, before any scan). */
  private def isStar(assigns: Seq[Assignment]): Boolean =
    assigns.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name == v.name
      case _ => false
    }

  private def checkActions(matched: Seq[MergeAction],
      notMatched: Seq[MergeAction], bySource: Seq[MergeAction]): Unit = {
    matched match {
      case Seq(UpdateAction(None, assigns, _)) if isStar(assigns) => ()
      case _ => refuse("has a WHEN MATCHED clause other than an " +
        "unconditional UPDATE SET *")
    }
    notMatched match {
      case Seq(InsertAction(None, assigns)) if isStar(assigns) => ()
      case _ => refuse("has a WHEN NOT MATCHED clause other than an " +
        "unconditional INSERT *")
    }
    if (bySource.nonEmpty)
      refuse("has WHEN NOT MATCHED BY SOURCE clauses")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case m: MergeIntoTable =>
      LakeSqlUpdate.lakeOf(m.targetTable) match {
        case None => m
        case Some(t) =>
          t.requireCurrentFor("MERGE")
          if (m.schemaEvolutionEnabled)
            refuse("requests WITH SCHEMA EVOLUTION (the lake evolves " +
              "schemas on the append path only)")
          val key = keyOf(m.mergeCondition)
          checkActions(m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions)
          LakeMergeCommand(t.tableRoot, m.sourceTable, key)
      }
  }
}

/** Runnable side of [[LakeSqlMerge]]: one upsert transaction
  * ([[LakeTable.merge]] validates schema equality and key uniqueness
  * before touching the table). */
case class LakeMergeCommand(root: String, source: LogicalPlan, key: String)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    LakeTable.merge(spark, root, GraftSqlBridge.ofRows(spark, source), key)
    Seq.empty
  }
}
