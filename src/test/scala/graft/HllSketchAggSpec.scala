package graft

import org.apache.spark.sql.functions._

import graft.events.EventOps

/** Native [[graft.functions.HllSketchAgg]] vs the SQL-composed HLL:
  * identical output (both are oracle-gated as events_hll /
  * events_hll_agg), ONE exchange instead of two, and partition-layout
  * invariance (the register merge is the aggregation, so how partial
  * buffers combine must never show in the result). */
class HllSketchAggSpec extends SparkSpec {

  test("native aggregate output equals the two-level groupBy exactly") {
    val a = EventOps.hllUsers(spark, sf001).collect().map(_.toSeq).toSeq
    val b = EventOps.hllUsersAgg(spark, sf001).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("one exchange, not two: the sketch is the shuffle compression") {
    // strip the presentation orderBy (a range exchange for deterministic
    // oracle output) — the claim is about the aggregation core
    graft.functions.HllSketchAgg.register(spark)
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 7), 16, 10)
      .cast("long")
    val base = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), h.as("h"))
    val native = base.groupBy("event_type")
      .agg(call_function("hll_sketch", col("h")).as("sk"))
    assert(countShuffles(native) == 1,
      "native HLL must aggregate in a single exchange")
    assert(countShuffles(EventOps.hllUsers(spark, sf001)) >= 2,
      "(sanity) the SQL spelling pays the (group,bucket) exchange first")
  }

  test("partition-layout invariance: merge order cannot change registers") {
    graft.functions.HllSketchAgg.register(spark)
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 7), 16, 10)
      .cast("long")
    val base = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), h.as("h"))
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(call_function("hll_sketch", col("h")).as("sk"))
        .select("event_type", "sk.used_buckets", "sk.harmonic_scaled")
        .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(sketch(base) == sketch(base.repartition(17, col("h"))))
    assert(sketch(base) == sketch(base.coalesce(1)))
  }

  test("SQL spelling through GraftExtensions.install") {
    graft.plans.GraftExtensions.install(spark)
    spark.read.parquet(s"$sf001/events.parquet").createOrReplaceTempView("ev")
    val r = spark.sql(
      """SELECT event_type,
        |  hll_sketch(CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 7), 16, 10) AS BIGINT)) AS sk
        |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)
      .select(col("event_type"), col("sk.used_buckets").as("used_buckets"),
        col("sk.harmonic_scaled").as("harmonic_scaled"))
      .collect().map(_.toSeq).toSeq
    assert(r == EventOps.hllUsers(spark, sf001).collect().map(_.toSeq).toSeq)
  }

  test("estimate from the native sketch tracks true distinct counts") {
    val truth = spark.read.parquet(s"$sf001/events.parquet")
      .groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    EventOps.hllUsersAgg(spark, sf001).collect().foreach { r =>
      val est = EventOps.hllEstimate(r.getLong(1), r.getLong(2))
      val d = truth(r.getString(0)).toDouble
      assert(math.abs(est - d) / d < 0.35,
        s"${r.getString(0)}: estimate $est vs true $d — m=64 HLL should be within ~35%")
    }
  }
}
