package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** AQE skew-join: the runtime re-plan path for hot join keys. Salting
  * (TextOps.topTermsSalted) is the write-time answer to skew; this spec
  * proves the complementary RUNTIME answer the engine relies on at 100 TB
  * — AQE detecting an oversized shuffle partition at stage boundary and
  * splitting it across extra tasks (OptimizeSkewedJoin), with no query
  * rewrite at all. Thresholds are lowered so a local-scale hot key
  * crosses them; at cluster scale the defaults (256 MB) play the same
  * role. */
class SkewJoinSpec extends SparkSpec {

  private def findSkewJoin(p: SparkPlan): Option[SortMergeJoinExec] = p match {
    case a: AdaptiveSparkPlanExec => findSkewJoin(a.executedPlan)
    case s: QueryStageExec => findSkewJoin(s.plan)
    case j: SortMergeJoinExec if j.isSkewJoin => Some(j)
    case other => other.children.view.flatMap(findSkewJoin).headOption
  }

  test("AQE splits a hot-key shuffle partition (isSkewJoin plan marker)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // coalescing would merge the tiny non-skewed partitions first and
      // can mask the split at this scale
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the left relation lands on key 0 — one pathological
      // shuffle partition, the rest tiny
      val left = spark.range(0, 200000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 97).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 97).select(
        col("id").as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k")

      // correctness first: every left row matches exactly one right row
      assert(joined.count() == 200000)

      val skew = findSkewJoin(finalPlan(joined))
      assert(skew.isDefined,
        "expected OptimizeSkewedJoin to mark the sort-merge join as skew-split")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
