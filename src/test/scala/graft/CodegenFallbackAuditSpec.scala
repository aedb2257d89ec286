package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Library-wide interpreted-expression audit (r8 verdict item 8): three
  * consecutive rounds found a `CodegenFallback` expression walking an
  * interpreted tree once per corpus row in a hot map stage
  * (`pc_register`'s min-distance loop in r6, the sim family's HOF
  * distance math in r7, the k-gram/winnow hashing HOFs in r8 — the
  * last one alone was winnow_index 7.0→1.3 s once nativized). This
  * spec is that hunt as a standing regression gate: it walks every
  * `SparkEntry.queries` OPTIMIZED plan and flags any node whose
  * expressions contain a `CodegenFallback` (Spark's higher-order
  * functions — transform/aggregate/filter/zip_with — are the usual
  * culprits) when that node evaluates once per row of an UNREDUCED
  * corpus-sized scan.
  *
  * Structural pass (no allowlist entry needed) — the fallback node's
  * input cardinality is already reduced or bounded when:
  *  - an Aggregate or Limit sits between the node and every file scan
  *    below it (the node runs per group / per limited row — e.g. the
  *    two-level quantizer's packed-codebook HOFs over the K1-row
  *    `groupBy(c1)` relation);
  *  - the node IS an Aggregate (its result expressions run per group);
  *  - every scan below is a fixed-cardinality dimension (nation,
  *    region) or there is no file scan at all (literal relations).
  *
  * Everything else must carry an allowlist entry stating the mechanism
  * that keeps the interpreted work acceptable — and "acceptable" is a
  * HIGH bar: per the r8 evidence, a HOF on a corpus scan is usually a
  * 3-5× hidden tax that a native `Expression` with `doGenCode` removes.
  */
class CodegenFallbackAuditSpec extends SparkSpec {

  private val boundedTables = Seq("nation", "region")

  /** Fallback expressions reachable from a node's expression list,
    * including inside nested lambda/subquery trees. */
  private def fallbacks(p: LogicalPlan): Seq[String] =
    p.expressions.flatMap(_.collect {
      case e: CodegenFallback => e.prettyName
    }).distinct

  /** Scans reachable from `p` WITHOUT crossing a row-reducing node:
    * what the fallback's per-input-row cost is proportional to. */
  private def hotScans(p: LogicalPlan): Seq[String] = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit => Nil
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.toSeq.map(_.toString)
          .filterNot(s => boundedTables.exists(t => s.endsWith(s"$t.parquet")))
      case _ => Nil
    }
    case v: DataSourceV2Relation => Seq(v.table.name())
    case other => other.children.flatMap(hotScans)
  }

  /** Fallbacks in an Aggregate that run PER INPUT ROW — grouping keys
    * and aggregate-function INPUTS evaluate once per scanned row during
    * partial aggregation, so a HOF there is just as hot as one in a
    * Project over the scan; only the post-aggregation result
    * expressions (outside aggregate functions) run per group. */
  private def perRowAggFallbacks(a: Aggregate): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    val perRow = a.groupingExpressions ++
      a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae.aggregateFunction.children
      }.flatten)
    perRow.flatMap(_.collect { case e: CodegenFallback => e.prettyName }).distinct
  }

  /** (node, fallback names, unreduced scans) triples that need review. */
  private def hotFallbacks(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case a: Aggregate if perRowAggFallbacks(a).nonEmpty =>
        // the Aggregate is NOT a barrier for its own per-row inputs
        val scans = a.children.flatMap(hotScans)
        if (scans.isEmpty) Nil
        else Seq(s"Aggregate-input[${perRowAggFallbacks(a).mkString(",")}] over " +
          scans.map(_.split('/').last).distinct.mkString("{", ",", "}"))
      case n if !n.isInstanceOf[Aggregate] && fallbacks(n).nonEmpty =>
        val scans = n.children.flatMap(hotScans)
        if (scans.isEmpty) Nil
        else Seq(s"${n.nodeName}[${fallbacks(n).mkString(",")}] over " +
          scans.map(_.split('/').last).distinct.mkString("{", ",", "}"))
      case _ => Nil
    }.flatten

  /** queryName -> (allowed hot-fallback count, reviewed justification).
    * Each reason states why the interpreted node is acceptable — a
    * bounded per-row cost Spark has no codegen path for, never "it was
    * easier". */
  private val allowlist: Map[String, (Int, String)] = Map.empty

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: no interpreted (CodegenFallback) expression over an unreduced corpus scan") {
      val df = fn(spark, sf001)
      val bad = hotFallbacks(df.queryExecution.optimizedPlan)
      val (allowed, why) = allowlist.getOrElse(name, (0, ""))
      assert(bad.size <= allowed,
        s"$name: ${bad.size} CodegenFallback node(s) evaluate per row of " +
          s"an unreduced corpus scan (allowed $allowed" +
          s"${if (why.nonEmpty) s": $why" else ""}) — ${bad.mkString("; ")}. " +
          "Replace the HOF/interpreted expression with a native Expression " +
          "whose doGenCode calls a static JIT-compiled helper (the " +
          "TextKernels / NearestCellRow pattern), or review and allowlist.")
    }
  }

  test("the audit detects a planted HOF over a corpus scan") {
    import org.apache.spark.sql.functions._
    val df = graft.text.TextOps.docs(spark, sf001)
      .select(expr("aggregate(sequence(1, 10), 0L, (a, x) -> a + x * length(text))").as("h"))
    assert(hotFallbacks(df.queryExecution.optimizedPlan).nonEmpty)
  }

  test("the audit detects a planted HOF hiding inside an Aggregate's per-row input") {
    import org.apache.spark.sql.functions._
    // the fold runs once per CORPUS ROW during partial aggregation —
    // the Aggregate node must not shield its own input expressions
    val df = graft.text.TextOps.docs(spark, sf001)
      .groupBy(col("lang"))
      .agg(sum(expr("aggregate(split(text, ' '), 0L, (a, w) -> a + length(w))")).as("s"))
    assert(hotFallbacks(df.queryExecution.optimizedPlan)
      .exists(_.startsWith("Aggregate-input")))
    // per-GROUP result expressions stay exempt: a HOF around the
    // aggregate's output runs |groups| times, not per row
    val ok = graft.text.TextOps.docs(spark, sf001)
      .groupBy(col("lang"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(expr("aggregate(ids, 0L, (a, x) -> a + x)").as("s"))
    assert(hotFallbacks(ok.queryExecution.optimizedPlan).isEmpty)
  }
}
