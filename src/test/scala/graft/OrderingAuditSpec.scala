package graft

import org.apache.spark.sql.catalyst.plans.logical._

/** Library-wide determinism audit: the driver's correctness gate hashes
  * each query's rows IN RESULT ORDER, so every `SparkEntry.queries`
  * entry must guarantee a deterministic global row order from its plan
  * alone — a new query that forgets its final ORDER BY would pass
  * locally by luck and flake in the driver's run. Walks every analyzed
  * plan and asserts the root (through order-preserving nodes) is one
  * of:
  *  - a GLOBAL Sort (`.orderBy`),
  *  - a Limit over a global Sort (`.orderBy(...).limit(k)` — planned
  *    as TakeOrderedAndProject, deterministic),
  *  - an ungrouped Aggregate (exactly one row — no order to get wrong).
  */
class OrderingAuditSpec extends SparkSpec {

  /** Nodes that preserve their child's row order. */
  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, c) => strip(c)
    case SubqueryAlias(_, c) => strip(c)
    case Filter(_, c) => strip(c)
    case _ => p
  }

  private def ordered(p: LogicalPlan): Boolean = strip(p) match {
    case Sort(_, true, _, _) => true
    case GlobalLimit(_, c) => ordered(c)
    case LocalLimit(_, c) => ordered(c)
    case a: Aggregate => a.groupingExpressions.isEmpty
    case _ => false
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: result order is plan-deterministic") {
      val plan = fn(spark, sf001).queryExecution.analyzed
      assert(ordered(plan),
        s"$name: no global ORDER BY (or 1-row aggregate) at the plan " +
          s"root — the driver's in-order hash compare would flake.\n" +
          s"root: ${strip(plan).nodeName}")
    }
  }
}
