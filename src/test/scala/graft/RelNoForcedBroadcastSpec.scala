package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, GlobalLimit, LocalLimit, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** The r5-verdict broadcast contract, generalized to the whole rel
  * surface — and, per the r6 verdict, AUTO-ENUMERATED from
  * `SparkEntry.queries` so no hand-kept case list can omit the next
  * `rel_large_orders` (which shipped a forced broadcast of an
  * SF-proportional HAVING survivor set precisely because the old
  * hand-kept Seq did not include it).
  *
  * Contract: a forced `broadcast()` hint is only legitimate on a
  * relation whose cardinality does NOT grow with the scale factor.
  * Structurally recognized bounded shapes:
  *   - an UNGROUPED aggregate immediately under the hint (1-row scalar,
  *     the `crossJoin(broadcast(globalAgg))` threshold pattern);
  *   - a LIMIT anywhere in the hinted subtree (post-top-k survivor
  *     sets, e.g. `rel_top_returned`'s 20-row perCust);
  *   - a subtree that scans NO SF-proportional base table (nation = 25
  *     rows, region = 5, literal relations).
  * Everything else — customer, supplier, part, orders, lineitem, and
  * any per-key aggregate or filter over them — must join WITHOUT a
  * hint, because a hint cannot degrade: at 100 TB it OOMs the driver
  * where AQE would fall back to a keyed shuffle join.
  *
  * Three checks, mirroring `BroadcastDegradeSpec`:
  *  1. per query: no non-exempt hint subtree scans an SF-proportional
  *     base table (analysis-only, every rel_* entry);
  *  2. at test SF the plans still broadcast via AQE where joins exist —
  *     dropping a hint costs nothing where it was safe;
  *  3. with broadcasting disabled (threshold -1) every plan's broadcast
  *     joins collapse to at most the hinted (bounded) ones, the rest
  *     degrade to keyed shuffle joins, and results are IDENTICAL — the
  *     scale fallback a forced hint forbids.
  */
class RelNoForcedBroadcastSpec extends SparkSpec {

  /** SF-proportional base tables: a hint over any of these is a
    * scale-killer regardless of how it is filtered or projected. */
  private val sfTables = Seq("customer", "supplier", "part", "orders", "lineitem")

  private def relQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    SparkEntry.queries.toSeq.filter(_._1.startsWith("rel_")).sortBy(_._1)

  /** A hint subtree is bounded-by-construction iff its immediate child
    * is an ungrouped aggregate (1 row) or the subtree contains a LIMIT
    * (≤ k rows downstream of it, regardless of what it scans). */
  private def boundedShape(h: ResolvedHint): Boolean = {
    val oneRowAgg = h.child match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case _ => false
    }
    val limited = h.child.collectFirst {
      case _: GlobalLimit => (); case _: LocalLimit => ()
    }.isDefined
    oneRowAgg || limited
  }

  /** Broadcast-strategy hints only: a `merge` hint (bucketed co-located
    * joins) FORCES the scale-safe plan and is always legal. */
  private def isBroadcast(h: ResolvedHint): Boolean =
    h.hints.strategy.contains(BROADCAST)

  /** Paths of SF-proportional parquet scans under non-exempt hints. */
  private def hintedSfScans(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case h: ResolvedHint if isBroadcast(h) && !boundedShape(h) =>
        h.child.collect { case l: LogicalRelation =>
          l.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
                .filter(p => sfTables.exists(t => p.endsWith(s"$t.parquet")))
            case _ => Nil
          }
        }.flatten
    }.flatten

  private def joinNodes(p: SparkPlan): (Seq[SparkPlan], Seq[SparkPlan]) = {
    val bhj = Seq.newBuilder[SparkPlan]
    val keyed = Seq.newBuilder[SparkPlan]
    def go(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case s: QueryStageExec => go(s.plan)
      case j: BroadcastHashJoinExec => bhj += j; j.children.foreach(go)
      case j: BroadcastNestedLoopJoinExec => bhj += j; j.children.foreach(go)
      case j: SortMergeJoinExec => keyed += j; j.children.foreach(go)
      case j: ShuffledHashJoinExec => keyed += j; j.children.foreach(go)
      case other => other.children.foreach(go)
    }
    go(p)
    (bhj.result(), keyed.result())
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---- 1. analysis-only hint audit, every rel_* entry -----------------
  for ((name, fn) <- relQueries) {
    test(s"$name: no forced broadcast of an SF-proportional relation") {
      val df = fn(spark, sf001)
      val bad = hintedSfScans(df.queryExecution.analyzed)
      assert(bad.isEmpty,
        s"$name hints an SF-proportional scan (OOMs at scale where AQE " +
          s"would degrade): $bad")
    }
  }

  // ---- 2./3. execution: AQE broadcast at test SF, degrade under -1 ----
  test("every rel query degrades to keyed shuffle joins with identical results when broadcast is off") {
    // baseline rows + per-query hint count under the default threshold
    val base = relQueries.map { case (name, fn) =>
      val df = fn(spark, sf001)
      val hints = df.queryExecution.analyzed.collect {
        case h: ResolvedHint if isBroadcast(h) => h
      }.size
      val (bhjDefault, _) = joinNodes(finalPlan(df))
      (name, rows(df), hints, bhjDefault.size)
    }
    // at test SF the small sides must be broadcast (hinted or AQE) —
    // a join-bearing plan with zero broadcast joins at sf0.01 means the
    // de-hinting cost real performance where it was safe
    for ((name, _, _, bhjN) <- base
         if Set("rel_large_orders", "rel_top_orders", "rel_nation_revenue",
           "rel_top_returned", "rel_waiting_supp").contains(name))
      assert(bhjN > 0, s"$name: expected AQE/hinted broadcast joins at sf0.01")

    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // rebuild the DataFrames UNDER the shrunk threshold (plans built
      // above were compiled under the default conf)
      for ((name, fn) <- relQueries) {
        val df = fn(spark, sf001)
        val (bhj, keyed) = joinNodes(finalPlan(df))
        val (_, baseRows, hints, bhjDefault) =
          base.find(_._1 == name).get
        assert(bhj.size <= hints,
          s"$name: ${bhj.size} broadcast joins survive threshold -1 but " +
            s"only $hints hints exist — an SF-proportional side is still " +
            "being force-broadcast")
        // a plan that broadcast-joined by size at the default threshold
        // must now run those joins as keyed shuffle joins
        if (bhjDefault > hints)
          assert(keyed.nonEmpty,
            s"$name: joins neither broadcast nor keyed under threshold -1")
        assert(rows(df) == baseRows, s"$name: results changed under degrade")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
