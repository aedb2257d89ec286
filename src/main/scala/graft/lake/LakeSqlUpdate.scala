package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, BinaryComparison, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** SQL `UPDATE lake.ns.t SET col = literal WHERE <range>` as a lake
  * transaction — the UPDATE twin of the `SupportsDeleteV2` DELETE path.
  *
  * Spark offers no simple connector hook for UPDATE (only the
  * group-based `SupportsRowLevelOperations` rewrite machinery), so this
  * follows the approach production lakehouse layers take: a planner
  * rule intercepts the analyzed [[UpdateTable]] over a lake relation
  * and replaces it with a command that runs
  * [[LakeTable.updateWhere]] — one copy-on-write transaction whose
  * affected files come from log stats alone.
  *
  * Conservative by design, mirroring [[LakeSqlDelete]]'s guards — an
  * untranslatable UPDATE throws loudly and commits nothing:
  *  - the predicate must be a conjunction of comparisons between
  *    numeric columns and exact literals — one interval per distinct
  *    column, same as the DELETE translation (float/double columns
  *    bounded on both sides — Spark orders NaN above +Inf, so an
  *    unbounded side would silently disagree with the row filter);
  *    disjunctions and expressions refuse;
  *  - assignment values must be foldable literals, inspected BENEATH
  *    any analyzer-inserted cast: a non-ANSI `Cast(2.5 AS BIGINT)`
  *    folds to 2 silently, so the rule unwraps the cast and hands the
  *    RAW literal to `updateWhere`, whose lossless-cast validation then
  *    refuses it (computed updates like `SET v = v + 1` are refused —
  *    the library `merge` covers those);
  *  - a missing/trivially-true WHERE (full-table update) is refused —
  *    there is no predicate column to scope the transaction.
  */
object LakeSqlUpdate extends Rule[LogicalPlan] {

  private val maxExactLong = (1L << 53).toDouble

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case u @ UpdateTable(rel, assignments, condition) =>
      lakeOf(rel) match {
        case None => u // not a lake table: leave for Spark to handle
        case Some(t) =>
          t.requireCurrentFor("UPDATE")
          val schema = rel.schema
          val ranges = condition.map(boundsOf(_, schema)).getOrElse(refuse(
            "has no WHERE clause; a full-table UPDATE has no predicate " +
              "column to scope the transaction"))
          val sets = assignments.map(assignmentOf(_, schema)).toMap
          LakeUpdateCommand(t.tableRoot, ranges, sets)
      }
  }

  private def refuse(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"lake: this UPDATE $why. Supported: UPDATE ... SET col = literal " +
        "[, ...] WHERE <comparisons of one numeric column with exact " +
        "literals, float ranges bounded on both sides>; use " +
        "LakeTable.merge for computed or keyed rewrites")

  private[lake] def lakeOf(plan: LogicalPlan): Option[LakeV2Table] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: LakeV2Table => Some(t)
      case _ => None
    }
    case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      lakeOf(a.child)
    case _ => None
  }

  // ---- predicate translation (mirror of LakeSqlDelete, catalyst side) --

  /** Conjunction of comparisons → one interval per distinct column
    * (multiple conjuncts on one column intersect), the multi-column
    * widening that matches [[LakeSqlDelete]]'s DELETE translation. */
  private def boundsOf(cond: Expression,
      schema: StructType): Seq[(String, Double, Double)] = {
    val leaves = flatten(cond)
    if (leaves.isEmpty)
      refuse("has a trivially-true WHERE; a full-table UPDATE has no " +
        "predicate column to scope the transaction")
    if (leaves.exists(_.isEmpty))
      refuse("contains a predicate that does not translate to a " +
        "per-column literal range conjunction")
    // resolve to schema fields FIRST (case-insensitive, like the
    // analyzer), then group by the RESOLVED name — same-column conjuncts
    // in different case spellings intersect into one range instead of
    // producing duplicate-column ranges (ADVICE r5; mirrors
    // [[LakeSqlDelete.translate]])
    val resolved = leaves.flatten.map { case (name, lo, hi) =>
      val field = schema.fields.find(_.name == name)
        .orElse(schema.fields.find(_.name.equalsIgnoreCase(name)))
        .getOrElse(refuse(s"references unknown column `$name`"))
      (field, lo, hi)
    }
    resolved.groupBy(_._1.name).toSeq.sortBy(_._1).map { case (name, bs) =>
      val field = bs.head._1
      val integral = field.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case FloatType | DoubleType => false
        case other => refuse(s"filters non-numeric column `$name` " +
          s"(${other.simpleString})")
      }
      val lo = bs.flatMap(_._2).foldLeft(Double.NegativeInfinity)(math.max)
      val hi = bs.flatMap(_._3).foldLeft(Double.PositiveInfinity)(math.min)
      if (!integral && (lo.isNegInfinity || hi.isPosInfinity))
        refuse(s"leaves float column `$name` unbounded on one side (Spark " +
          "orders NaN above +Infinity, so the range and the row filter " +
          "could silently disagree)")
      (field.name, lo, hi)
    }
  }

  private def flatten(e: Expression): Seq[Option[(String, Option[Double], Option[Double])]] =
    e match {
      case CAnd(l, r) => flatten(l) ++ flatten(r)
      case Literal(true, BooleanType) => Seq.empty
      case cmp: BinaryComparison => Seq(leaf(cmp))
      case _ => Seq(None)
    }

  /** Foldable numeric expression → exact Double, with the same
    * exactness guards as the DELETE path (longs beyond 2⁵³, NaN and
    * infinities, inexact decimals all refuse). */
  private def litOf(e: Expression): Option[Double] = {
    if (!e.foldable) return None
    val v = e.eval(null)
    (v, e.dataType) match {
      case (null, _) => None
      case (b: Byte, _) => Some(b.toDouble)
      case (s: Short, _) => Some(s.toDouble)
      case (i: Int, _) => Some(i.toDouble)
      case (l: Long, _) =>
        if (math.abs(l) > maxExactLong) None else Some(l.toDouble)
      case (f: Float, _) =>
        if (f.isNaN || f.isInfinite) None else Some(f.toDouble)
      case (d: Double, _) => if (d.isNaN || d.isInfinite) None else Some(d)
      case (d: org.apache.spark.sql.types.Decimal, _) =>
        val bd = d.toBigDecimal
        val asD = bd.toDouble
        if (!asD.isInfinite && BigDecimal(asD) == bd) Some(asD) else None
      case _ => None
    }
  }

  private def leaf(cmp: BinaryComparison): Option[(String, Option[Double], Option[Double])] = {
    // the column side must be the BARE attribute: an analyzer-inserted
    // cast around the column changes comparison semantics, so refuse
    def colOf(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    val parsed = (colOf(cmp.left), litOf(cmp.right),
        colOf(cmp.right), litOf(cmp.left)) match {
      case (Some(c), Some(v), _, _) => Some((c, v, false))
      case (_, _, Some(c), Some(v)) => Some((c, v, true))
      case _ => None
    }
    parsed.flatMap { case (c, v, flipped) =>
      cmp match {
        case _: EqualTo => Some((c, Some(v), Some(v)))
        case _: GreaterThanOrEqual =>
          if (flipped) Some((c, None, Some(v))) else Some((c, Some(v), None))
        case _: GreaterThan =>
          if (flipped) Some((c, None, Some(Math.nextDown(v))))
          else Some((c, Some(Math.nextUp(v)), None))
        case _: LessThanOrEqual =>
          if (flipped) Some((c, Some(v), None)) else Some((c, None, Some(v)))
        case _: LessThan =>
          if (flipped) Some((c, Some(Math.nextUp(v)), None))
          else Some((c, None, Some(Math.nextDown(v))))
        case _ => None
      }
    }
  }

  // ---- assignment translation ------------------------------------------

  private def assignmentOf(a: Assignment, schema: StructType): (String, Any) = {
    val name = a.key match {
      case ar: AttributeReference => ar.name
      case other => refuse(s"assigns a non-column target `$other`")
    }
    // unwrap analyzer-inserted casts down to the raw literal: the cast
    // itself may silently truncate (non-ANSI Cast(2.5 AS BIGINT) folds
    // to 2), and updateWhere's lossless validation must see the ORIGINAL
    // value to refuse that
    def raw(e: Expression): Expression = e match {
      case Cast(inner, _, _, _) => raw(inner)
      case other => other
    }
    val v = raw(a.value)
    if (!v.foldable)
      refuse(s"assigns `$name` a non-literal value; computed updates " +
        "need LakeTable.merge")
    val jvm = CatalystTypeConverters.convertToScala(v.eval(null), v.dataType)
    (name, jvm)
  }
}

/** Runnable side of [[LakeSqlUpdate]]: one lake transaction. */
case class LakeUpdateCommand(root: String,
    ranges: Seq[(String, Double, Double)],
    assignments: Map[String, Any]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    LakeTable.updateWhereRanges(spark, root, ranges, assignments)
    Seq.empty
  }
}
