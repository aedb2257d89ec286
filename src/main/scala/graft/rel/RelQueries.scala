package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Relational analytics over the TPC-H-shaped testdata — the keyed
  * aggregation / multi-way join surface the reference never needed (its
  * workload is spatial filters) but a complete engine must have.
  *
  * Scale design:
  *  - dimension tables (`region`, `nation`, and at these SFs `customer`)
  *    are explicitly `broadcast()` — no shuffle of the fact table for
  *    dimension joins, the classic 100 TB star-join plan;
  *  - the `lineitem`→`orders` join is the only genuine shuffle pair, and
  *    both sides shuffle on the join key once (AQE handles skew);
  *  - money math is exact: cents = round(price*100) as BIGINT, revenue in
  *    1e-4 currency units = cents * (100 - discount_cents), so sums are
  *    integer and hash-compare across engines regardless of order.
  */
object RelQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def cents(c: String) = round(col(c) * 100).cast(LongType)

  /** TPC-H Q1-shaped pricing summary: one scan of lineitem, all
    * aggregates map-side combinable. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(LongType)).as("sum_qty"),
        sum(cents("l_extendedprice")).as("sum_base_cents"),
        sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
          .as("sum_disc_units"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_units,
      | count(*) AS cnt
      | FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      | GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")

  /** ROLLUP pricing summary: hierarchical totals (flag × status → flag →
    * grand total) in one pass — grouping-sets surface the reference lacks
    * entirely. `grouping_id` disambiguates rollup rows; keys coalesce to
    * '(all)' so the output is null-free for stable hashing. */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("cnt"),
        sum(cents("l_extendedprice")).as("sum_base_cents"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("gid"), col("cnt"), col("sum_base_cents"))
      .orderBy("gid", "rf", "ls")

  val rollupSummarySql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      | coalesce(l_linestatus, '(all)') AS ls,
      | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      | count(*) AS cnt,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents
      | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      | ORDER BY gid, rf, ls""".stripMargin.replace("\n", " ")

  /** TPC-H Q3-shaped shipping priority: broadcast the filtered customer
    * dimension, shuffle-join orders⋈lineitem, top-10 revenue orders
    * (TakeOrderedAndProject — no global sort). */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast(LongType).as("o_epoch_day"))
      .agg(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
        .as("revenue_units"))
      .orderBy(col("revenue_units").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val topOrdersSql: String =
    """SELECT o_orderkey,
      | CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS o_epoch_day,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units
      | FROM customer JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      | WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      | GROUP BY 1, 2 ORDER BY revenue_units DESC, o_orderkey ASC LIMIT 10""".stripMargin.replace("\n", " ")

  /** TPC-H Q5-shaped revenue by nation: the full star — region and
    * nation broadcast (tiny), customer broadcast (small), one
    * orders⋈lineitem shuffle. */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = t(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount")))
        .as("revenue_units"), count(lit(1)).as("cnt"))
      .orderBy(col("revenue_units").desc, col("n_name").asc)
  }

  val nationRevenueSql: String =
    """SELECT n_name,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units,
      | count(*) AS cnt
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      | WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      | GROUP BY 1 ORDER BY revenue_units DESC, n_name ASC""".stripMargin.replace("\n", " ")

  /** TPC-H Q17-shaped small-quantity revenue: revenue from lineitems of
    * one brand whose quantity is below 20% of that part's average — the
    * classic correlated scalar subquery, DECORRELATED by hand into an
    * aggregate-then-join (the plan every optimizer rewrites Q17 into).
    *
    * Scale design: the brand part list broadcasts, semi-filtering
    * lineitem map-side FIRST, so the per-part average aggregates only
    * the brand's lineitems (~1/|brands| of the table) — and that tiny
    * part-keyed aggregate broadcasts back, so the fact table is never
    * shuffled at all: two map-only passes + one small agg.
    *
    * `l_quantity < 0.2 * avg(q)` is evaluated as the integer cross
    * product `q * 5 * cnt < sum_q` — exact in both engines, no float
    * division. */
  def smallQtyRevenue(brand: String)(spark: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(t(spark, dir, "part")
      .filter(col("p_brand") === brand).select("p_partkey"))
    val liBrand = t(spark, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"),
        col("l_quantity").cast(LongType).as("q"),
        cents("l_extendedprice").as("price_cents"))
    val perPart = liBrand.groupBy("l_partkey")
      .agg(sum(col("q")).as("sum_qty"), count(lit(1)).as("cnt_qty"))
    liBrand.join(broadcast(perPart), "l_partkey")
      .filter(col("q") * 5 * col("cnt_qty") < col("sum_qty"))
      .agg(count(lit(1)).as("cnt"),
        coalesce(sum(col("price_cents")), lit(0L)).as("rev_cents"))
  }

  def smallQtyRevenueSql(brand: String): String =
    s"""WITH lb AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
       |   CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
       |  FROM lineitem SEMI JOIN part ON l_partkey = p_partkey AND p_brand = '$brand'),
       | pp AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS sum_qty, count(*) AS cnt_qty
       |  FROM lb GROUP BY 1)
       | SELECT count(*) AS cnt, CAST(coalesce(sum(price_cents), 0) AS BIGINT) AS rev_cents
       | FROM lb JOIN pp USING (l_partkey)
       | WHERE q * 5 * cnt_qty < sum_qty""".stripMargin.replace("\n", " ")
}
