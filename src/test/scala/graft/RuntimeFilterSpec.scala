package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a selective dimension filter
  * can't be pushed into the fact scan statically (the filter is on the
  * OTHER side of the join), Spark's runtime-filter optimizer injects a
  * bloom filter built from the dimension side and applies it to the
  * fact side BEFORE the shuffle — at 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~matching
  * fraction. This spec pins that the engine configuration here actually
  * fires the rewrite (plan shows `bloom_filter_might_contain` /
  * BloomFilterAggregate) and that results are identical with it on. */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a runtime bloom filter on the fact side") {
    val confs = Seq(
      // thresholds sized so the sf0.001 fixture qualifies: the creation-
      // side filter must look selective and the application side big
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter did not fire:\n$optimized")

      // and it must not change the answer
      val n = joined.collect()(0).getLong(1)
      val expected = li.join(
        spark.read.parquet(s"$sf0001/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
