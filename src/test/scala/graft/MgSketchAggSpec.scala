package graft

import org.apache.spark.sql.functions._

import graft.functions.MgSketchAgg
import graft.text.TextOps

/** Misra-Gries heavy-hitters aggregate: the superset guarantee under
  * partitioned update+merge, state boundedness, and the two-pass exact
  * query against a brute-force recount. */
class MgSketchAggSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) = {
    MgSketchAgg.register(spark)
    val row = df.agg(call_function("mg_sketch", col("term"), lit(k)).as("sk"))
      .select(col("sk.n"), col("sk.terms")).head()
    (row.getLong(0), row.getSeq[String](1))
  }

  test("every item with frequency > n/k survives update + merge; state stays <= k") {
    val s = spark
    import s.implicits._
    // 40k-row stream over 16 partitions: two heavy terms (12k + 6k)
    // drowned in a long tail of 22k near-unique terms
    val rows = (0 until 12000).map(_ => "heavy_a") ++
      (0 until 6000).map(_ => "heavy_b") ++
      (0 until 22000).map(i => s"tail_${i % 11000}")
    val df = rows.toDF("term").repartition(16)
    val k = 16 // threshold n/k = 2500 — both heavy terms qualify
    val (n, cands) = sketch(df, k)
    assert(n == 40000L)
    assert(cands.size <= k, s"summary exceeded k: ${cands.size}")
    assert(cands.contains("heavy_a") && cands.contains("heavy_b"),
      s"over-threshold terms missing from $cands")
  }

  test("the summary is one exchange of bounded state") {
    // 8 input partitions WITHOUT a repartition shuffle (range is
    // natively partitioned), so the only exchange is the sketch merge
    val df = spark.range(0, 5000, 1, 8)
      .select(concat(lit("t"), col("id") % 97).as("term"))
    MgSketchAgg.register(spark)
    val agg = df.agg(call_function("mg_sketch", col("term"), lit(8)))
    assert(countShuffles(agg) == 1, "grouped sketch must be ONE exchange")
  }

  test("grouped form (events heavy users) is exact per group") {
    val hh = graft.events.EventOps.heavyUsers(200)(spark, sf001).collect()
    val ev = spark.read.parquet(s"$sf001/events.parquet")
      .select(col("event_type"), col("user_id"))
    val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val brute = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .join(n, "event_type")
      .filter(col("cnt") * 200 > col("n"))
      .select(col("event_type"), col("user_id"), col("cnt"))
      .orderBy(col("event_type"), col("cnt").desc, col("user_id"))
      .collect()
    assert(hh.nonEmpty && hh.toSeq == brute.toSeq,
      s"grouped two-pass diverged (${hh.length} vs ${brute.length})")
  }

  test("docHeavyHitters is exact: matches the brute-force recount") {
    val hh = TextOps.docHeavyHitters(50)(spark, sf001).collect()
    // brute force: full groupBy, same threshold
    val toks = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("term"))
    val n = toks.count()
    val brute = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .filter(col("tf") * 50 > n)
      .orderBy(col("tf").desc, col("term").asc)
      .collect()
    assert(hh.nonEmpty, "fixture has no heavy hitters at denom=50")
    assert(hh.toSeq == brute.toSeq,
      s"two-pass result diverged from brute force (${hh.length} vs ${brute.length})")
  }
}
