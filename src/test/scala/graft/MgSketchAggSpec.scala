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

  test("compaction only fires when it evicts: the hit-min/miss adversary stays O(1)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = MgSketchAgg(BoundReference(0, StringType, nullable = true), 4)
    val buf = agg.createAggregationBuffer()
    def feed(t: String): Unit = { agg.update(buf, InternalRow(UTF8String.fromString(t))); () }
    // fill the table: A at logical 2, B/C/D far above (stored 9)
    Seq("a", "a").foreach(feed)
    for (t <- Seq("b", "c", "d"); _ <- 0 until 9) feed(t)
    assert(buf.compactions == 0L)
    // the adversary: hit the unique minimum, then miss — with a stale
    // min-tracker every pair triggered an O(k) compaction that evicted
    // nothing; the exact level histogram must fire ZERO compactions
    // here because base (ends at 5) never reaches the true minimum
    for (_ <- 0 until 5) { feed("a"); feed(s"miss_${buf.base}") }
    assert(buf.compactions == 0L,
      s"${buf.compactions} no-op compactions fired — the watermark went stale")
    // and the summary is still exactly right: logical = stored - base
    val logical = buf.counts.view.mapValues(_ - buf.base).toMap
    assert(logical == Map("a" -> 2L, "b" -> 4L, "c" -> 4L, "d" -> 4L),
      s"unexpected summary state: $logical")
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
