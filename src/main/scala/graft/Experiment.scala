package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pc.{Aabb, Layout, Points}

/** End-to-end partitioning experiment — the Spark twin of the reference's
  * experiment driver (pc-cli/examples/partition.rs:22-136):
  *
  *  1. time the convert stage (points + importance → plain Parquet),
  *  2. time the three partitioning methods (grid(1), grid(8), quadtree),
  *  3. run the reference's seeded query suite (ChaCha20 seed 76 there, a
  *     seed-76 `scala.util.Random` here; same boxes on every layout)
  *     `runs` times per query on EVERY layout and report
  *     mean ± stdev + mean row count, exactly the reference's statistic
  *     (pc-cli/src/benchmark.rs:267-282),
  *  4. assert the counts agree across layouts — the reference's implicit
  *     correctness check ("same query ⇒ same count on every layout").
  *
  * The layouts only change physical clustering, so identical counts prove
  * result-preservation while the timing table shows what the clustering
  * buys each query class. Usage:
  *   sbt "runMain graft.Experiment [sfDir] [outDir] [runs]"
  */
object Experiment {

  final case class QueryStat(layout: String, query: String,
      meanSec: Double, stdevSec: Double, meanRows: Double)

  final case class Result(stageSec: Map[String, Double], stats: Seq[QueryStat])

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** The reference suite over one layout: count, bounds, S/M_RECT,
    * S/M_CRC, p(small/mid/large), NN_1000 — boxes/centers from `rnd`. */
  private def suite(df: DataFrame, bounds: Aabb, rnd: scala.util.Random,
      sRectEdge: Double, mRectEdge: Double): Seq[(String, DataFrame)] = {
    def origin(edge: Double): (Double, Double) = (
      bounds.lower(0) + rnd.nextDouble() * (bounds.upper(0) - bounds.lower(0) - edge),
      bounds.lower(1) + rnd.nextDouble() * (bounds.upper(1) - bounds.lower(1) - edge))
    // each query IS the filter: `.count()` then equals the reference's
    // "rows returned" statistic, making the invariance check meaningful
    def rect(name: String, edge: Double) = {
      val (x0, y0) = origin(edge)
      name -> df.filter(Points.boxPredicate(Aabb.xy(x0, y0, x0 + edge, y0 + edge)))
    }
    def circle(name: String, r: Double) = {
      val (cx, cy) = origin(2 * r)
      val pre = df.filter(Points.boxPredicate(Aabb.xy(cx - r, cy - r, cx + r, cy + r)))
      val d2 = (col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy)
      name -> pre.filter(d2 < r * r)
    }
    def sample(name: String, p: Double) =
      name -> df.filter(col("i") < p)
    def knn(name: String, k: Int, r: Double) = {
      val (cx, cy) = origin(2 * r)
      name -> df.filter(Points.boxPredicate(Aabb.xy(cx - r, cy - r, cx + r, cy + r)))
        .withColumn("d2",
          (col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy))
        .orderBy(col("d2").asc).limit(k)
    }
    Seq(
      "count" -> df,
      "bounds" -> df.agg(min("x"), max("x"), min("y"), max("y"), min("i"), max("i")),
      rect("s_rect", sRectEdge), rect("m_rect", mRectEdge),
      circle("s_crc", sRectEdge / 2.8), circle("m_crc", mRectEdge / 2.2),
      sample("p_small", 0.1), sample("p_mid", 0.5), sample("p_large", 0.7),
      knn("nn_1000", 1000, sRectEdge))
  }

  def run(spark: SparkSession, sfDir: String, outDir: String,
      runs: Int = 3, batchSize: Long = Layout.BatchSize): Result = {
    // persist: ~10 downstream actions (4 writes + their bounds passes)
    // would otherwise re-scan lineitem AND re-evaluate rand(seed) each
    // time — the count-invariance check must not depend on rand
    // re-evaluation being partition-stable
    val pts = Points.withImportance(
      Points.fromLineitem(spark, sfDir).select("x", "y", "pid"), seed = 42L)
      .persist()
    val (bounds, _) = Layout.boundsAndCount(pts)

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val (_, tConvert) = time {
      pts.write.mode("overwrite")
        .option("maxRecordsPerFile", batchSize).parquet(s"$outDir/plain")
    }
    stages += "convert" -> tConvert
    val (_, tG1) = time(Layout.writeGrid(pts, s"$outDir/grid1", 1, batchSize))
    stages += "grid(1)" -> tG1
    val (_, tG8) = time(Layout.writeGrid(pts, s"$outDir/grid8", 8, batchSize))
    stages += "grid(8)" -> tG8
    val (_, tQ) = time(Layout.writeQuadtree(pts, s"$outDir/quadtree", batchSize))
    stages += "quadtree" -> tQ

    pts.unpersist(blocking = false)
    val layouts = Seq("plain", "grid1", "grid8", "quadtree")
    val edge = (bounds.upper(0) - bounds.lower(0)) / 14.0 // ~S_RECT scale
    val stats = layouts.flatMap { l =>
      val df = spark.read.parquet(s"$outDir/$l")
      // fresh seed per layout => every layout sees the SAME workload
      val rnd = new scala.util.Random(76)
      suite(df, bounds, rnd, edge, edge * 3.1).map { case (qname, q) =>
        val samples = (0 until runs).map(_ => time(q.count()))
        val times = samples.map(_._2)
        val rows = samples.map(_._1.toDouble)
        val mean = times.sum / runs
        val stdev = math.sqrt(times.map(t => (t - mean) * (t - mean)).sum / runs)
        QueryStat(l, qname, mean, stdev, rows.sum / runs)
      }
    }
    Result(stages.toMap, stats)
  }

  /** Reference-style invariance check: identical mean row counts for the
    * same query across all layouts. Returns offending query names. */
  def invarianceViolations(r: Result): Seq[String] =
    r.stats.groupBy(_.query).collect {
      case (q, ss) if ss.map(_.meanRows).distinct.size > 1 => q
    }.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_experiment").toString)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = LocalSession("8")
    val r = run(spark, sfDir, outDir, runs, batchSize = 65536L)
    println(f"${"stage"}%-10s time")
    r.stageSec.foreach { case (s, t) => println(f"$s%-10s $t%8.2fs") }
    println(f"\n${"query"}%-10s ${"layout"}%-10s mean±stdev        rows")
    r.stats.sortBy(s => (s.query, s.layout)).foreach { s =>
      println(f"${s.query}%-10s ${s.layout}%-10s ${s.meanSec}%6.3fs ±${s.stdevSec}%6.3fs ${s.meanRows}%10.0f")
    }
    val bad = invarianceViolations(r)
    if (bad.nonEmpty) { println(s"INVARIANCE VIOLATED: $bad"); sys.exit(1) }
    println("\ninvariance: same counts on every layout — OK")
    spark.stop()
  }
}
