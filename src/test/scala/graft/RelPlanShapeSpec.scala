package graft

import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import graft.rel.RelQueries

/** Plan-shape pins for the two r4-verdict "weak" relational plans. These
  * assert on the OPTIMIZED LOGICAL plan (stable under AQE's physical
  * re-planning), because the property being protected is structural:
  * which filters sit below which joins, and in what order the joins run.
  */
class RelPlanShapeSpec extends SparkSpec {

  private def joins(p: LogicalPlan): Seq[Join] =
    p.collect { case j: Join => j }

  private def refs(p: LogicalPlan, col: String): Boolean =
    p.collect { case n if n.expressions.exists(_.references.exists(_.name == col)) => n }.nonEmpty

  test("partBands: the broadcast part side carries the implied brand filter") {
    val df = RelQueries.partBands(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan
    // the part-side subtree of the partkey join must contain a Filter
    // mentioning p_brand BELOW the join (i.e. the ~20M-row unfiltered
    // dimension never ships under the forced broadcast)
    val j = joins(plan).find(j => refs(j, "p_partkey")).get
    val partSide = Seq(j.left, j.right).find(s => refs(s, "p_brand")).get
    val brandFilters = partSide.collect {
      case f: Filter if f.condition.references.exists(_.name == "p_brand") => f
    }
    assert(brandFilters.nonEmpty, s"no p_brand filter below the part join:\n$plan")
    assert(brandFilters.exists(_.condition.toString.contains("IN")),
      s"brand filter is not the IN-list residual:\n${brandFilters.map(_.condition)}")
    // and the quantity envelope reaches the parquet scan as a pushed filter
    val physical = finalPlan(df).toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      s"quantity envelope not pushed to the lineitem scan")
    // correctness unchanged by the pushdown
    assert(df.collect()(0).getLong(0) > 0)
  }

  test("mktShare: supplier semi-reduction joins lineitem BEFORE the orderkey join") {
    val df = RelQueries.mktShare("NATION_2", "ASIA")(spark, sf0001)
    val plan = df.queryExecution.optimizedPlan
    val orderJoin = joins(plan).find(j =>
      j.condition.exists(_.references.exists(_.name == "o_orderkey"))).get
    // the suppkey join must be a DESCENDANT of the orderkey join's
    // lineitem side — the region-filtered supplier set semi-reduces the
    // fact before the one fact-fact shuffle
    val suppJoinBelow = Seq(orderJoin.left, orderJoin.right).exists(side =>
      joins(side).exists(j =>
        j.condition.exists(_.references.exists(_.name == "s_suppkey"))))
    assert(suppJoinBelow,
      s"supplier join is not below the orderkey join:\n$plan")
    // and the orders side of that join is a bare scan subtree (no joins)
    val ordersSide = Seq(orderJoin.left, orderJoin.right)
      .find(s => refs(s, "o_orderdate")).get
    assert(joins(ordersSide).isEmpty ||
      !joins(ordersSide).exists(j =>
        j.condition.exists(_.references.exists(_.name == "s_suppkey"))),
      "orders side unexpectedly carries the supplier join")
    assert(df.collect().nonEmpty)
  }
}
