package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pc.{Layout, Points}
import graft.plans.GraftExtensions

/** Catalyst circle-prefilter rule: the naive circle predicate gains a
  * pushable bbox, pruning row groups like the hand-written two-phase
  * query, with identical results. */
class CirclePrefilterRuleSpec extends SparkSpec {

  private lazy val layoutDir: String = {
    val dir = Files.createTempDirectory("circle_rule").toString
    val pts = Points.withImportance(
      Points.fromLineitem(spark, sf001).select("x", "y", "pid"), seed = 3L)
    Layout.writeGrid(pts, dir, sigma = 1, batchSize = 2048L)
    dir
  }

  private def circleDf(): DataFrame = {
    val (cx, cy, r) = (400.0, 400.0, 60.0)
    val d2 = (col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy)
    spark.read.parquet(layoutDir).filter(d2 < r * r) // naive: no bbox
  }

  private def pushedFilters(df: DataFrame): String = {
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df.collect()
    df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString
  }

  test("rule injects a pushable bbox; results identical; plan is idempotent") {
    // other suites may have installed the rule on the shared session
    // (circleOnGridNaive does); start from a clean slate
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.CirclePrefilterRule)
    // without the rule: nothing pushable in the naive predicate
    val before = pushedFilters(circleDf())
    assert(!before.contains("GreaterThanOrEqual(x"),
      s"expected no pushable range without the rule, got: $before")
    val expected = circleDf().count()

    GraftExtensions.install(spark)
    try {
      val after = pushedFilters(circleDf())
      assert(after.contains("GreaterThanOrEqual(x") && after.contains("LessThanOrEqual(x")
        && after.contains("GreaterThanOrEqual(y"),
        s"bbox not pushed: $after")
      assert(circleDf().count() == expected)
      // idempotence: the optimized condition has exactly 4 derived bounds
      val cond = circleDf().queryExecution.optimizedPlan.toString
      assert(cond.sliding("(x >= ".length).count(_ == "(x >= ") <= 1, cond)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.CirclePrefilterRule)
    }
  }

  test("rule leaves non-circle filters untouched") {
    GraftExtensions.install(spark)
    try {
      val df = spark.read.parquet(layoutDir).filter(col("x") > 100.0)
      val n = df.count()
      assert(n == spark.read.parquet(layoutDir).filter(col("x") > 100.0).count())
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("y >="), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.CirclePrefilterRule)
    }
  }
}
