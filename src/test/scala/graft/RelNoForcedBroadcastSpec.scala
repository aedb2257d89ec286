package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}

import graft.rel.RelQueries

/** The r5-verdict broadcast contract, generalized to the whole rel
  * surface: a forced `broadcast()` hint is only legitimate on a
  * relation whose cardinality does NOT grow with the scale factor
  * (nation = 25 rows, region = 5, post-LIMIT survivor sets, 1-row
  * scalar aggregates). Everything SF-proportional — customer, supplier,
  * part, brand/segment slices, per-key aggregates — must join WITHOUT a
  * hint, because a hint cannot degrade: at 100 TB it OOMs where AQE
  * would fall back to a keyed shuffle.
  *
  * Three assertions per query, mirroring `BroadcastDegradeSpec`:
  *  1. no ResolvedHint subtree scans an SF-proportional base table;
  *  2. at test SF the unhinted plan still broadcasts (AQE, from size —
  *     dropping the hint costs nothing where it was safe);
  *  3. with broadcasting disabled (threshold -1) the plan degrades to
  *     sort-merge with IDENTICAL results — the scale fallback a hint
  *     forbids. Bounded hints (nation/region) are exempt: a hint-forced
  *     broadcast of 25 rows is the point of the exemption.
  */
class RelNoForcedBroadcastSpec extends SparkSpec {

  /** SF-proportional base tables: a hint over any of these is a
    * scale-killer regardless of how it is filtered or projected. */
  private val sfTables = Seq("customer", "supplier", "part", "orders", "lineitem")

  /** (query, builder, bounded-hint count expected in the analyzed plan). */
  private val cases: Seq[(String, DataFrame, Int)] = {
    lazy val s = spark
    Seq(
      ("rel_top_orders", RelQueries.topOrders(s, sf001), 0),
      ("rel_nation_revenue", RelQueries.nationRevenue(s, sf001), 2), // nation, region
      ("rel_nation_pairs", RelQueries.nationPairs(s, sf001), 2), // nation ×2 (post-agg)
      ("rel_promo_share", RelQueries.promoShare(s, sf001), 0),
      ("rel_waiting_supp", RelQueries.waitingSuppliers(s, sf001), 0),
      ("rel_small_qty_rev", RelQueries.smallQtyRevenue("Brand#4")(s, sf001), 0),
      ("rel_cheapest_supplier", RelQueries.cheapestSupplier("Brand#5")(s, sf001), 0),
      ("rel_part_bands", RelQueries.partBands(s, sf001), 0),
      ("rel_partsupp_value",
        RelQueries.partsuppValue("NATION_7", 3L)(s, sf001), 1), // 1-row scalar
      ("rel_dominant_supp", RelQueries.dominantSuppliers(
        "Brand#2", "1996-01-01", "1998-01-01")(s, sf001), 0))
  }

  /** Paths of SF-proportional parquet scans under ResolvedHint nodes.
    * A hint whose immediate child is an UNGROUPED aggregate is exempt:
    * the broadcast side is a 1-row scalar regardless of what its
    * subtree scans (the `crossJoin(broadcast(globalAgg))` threshold
    * pattern) — bounded by construction, not by table cardinality. */
  private def hintedSfScans(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if !(h.child match {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.groupingExpressions.isEmpty
        case _ => false
      }) =>
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
    val smj = Seq.newBuilder[SparkPlan]
    def go(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case s: QueryStageExec => go(s.plan)
      case j: BroadcastHashJoinExec => bhj += j; j.children.foreach(go)
      case j: BroadcastNestedLoopJoinExec => bhj += j; j.children.foreach(go)
      case j: SortMergeJoinExec => smj += j; j.children.foreach(go)
      case other => other.children.foreach(go)
    }
    go(p)
    (bhj.result(), smj.result())
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for ((name, df, boundedHints) <- cases) {
    test(s"$name: no forced broadcast of an SF-proportional relation") {
      val bad = hintedSfScans(df)
      assert(bad.isEmpty, s"hinted SF-proportional scans: $bad")
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      assert(hints.size == boundedHints,
        s"expected $boundedHints bounded hints, got ${hints.size}")
    }
  }

  test("unhinted joins broadcast via AQE at test SF (no perf loss)") {
    for ((name, df, _) <- cases) {
      val (bhj, _) = joinNodes(finalPlan(df))
      assert(bhj.nonEmpty, s"$name: AQE should broadcast small sides at sf0.01")
    }
  }

  test("plans degrade to sort-merge with identical results when broadcast is off") {
    val base = cases.map { case (name, df, _) => name -> rows(df) }.toMap
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // rebuild the DataFrames UNDER the shrunk threshold (the cached
      // `cases` plans were compiled under the default conf)
      val rebuilt: Seq[(String, DataFrame, Int)] = Seq(
        ("rel_top_orders", RelQueries.topOrders(spark, sf001), 0),
        ("rel_nation_revenue", RelQueries.nationRevenue(spark, sf001), 2),
        ("rel_nation_pairs", RelQueries.nationPairs(spark, sf001), 2),
        ("rel_promo_share", RelQueries.promoShare(spark, sf001), 0),
        ("rel_waiting_supp", RelQueries.waitingSuppliers(spark, sf001), 0),
        ("rel_small_qty_rev", RelQueries.smallQtyRevenue("Brand#4")(spark, sf001), 0),
        ("rel_cheapest_supplier", RelQueries.cheapestSupplier("Brand#5")(spark, sf001), 0),
        ("rel_part_bands", RelQueries.partBands(spark, sf001), 0),
        ("rel_partsupp_value",
          RelQueries.partsuppValue("NATION_7", 3L)(spark, sf001), 1),
        ("rel_dominant_supp", RelQueries.dominantSuppliers(
          "Brand#2", "1996-01-01", "1998-01-01")(spark, sf001), 0))
      for ((name, df, boundedHints) <- rebuilt) {
        val (bhj, smj) = joinNodes(finalPlan(df))
        assert(smj.nonEmpty,
          s"$name: with broadcast off, joins must degrade to sort-merge")
        assert(bhj.size <= boundedHints,
          s"$name: ${bhj.size} broadcast joins survive threshold -1 but only " +
            s"$boundedHints bounded hints exist — an SF-proportional side is " +
            "still being broadcast")
        assert(rows(df) == base(name), s"$name: results changed under degrade")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
