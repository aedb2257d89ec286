package graft

import org.apache.spark.sql.functions._
import graft.sim.{SemDedup, SimOps}

/** SemDeDup-style semantic dedup: within-cluster dominance prune. */
class SemDedupSpec extends SparkSpec {

  private lazy val result = SemDedup.semDedup(SemDedup.Tau)(spark, sf001).cache()

  test("covers every vector exactly once, and actually prunes") {
    val n = SimOps.embeddings(spark, sf001).count()
    assert(result.count() == n)
    assert(result.select("vec_id").distinct().count() == n)
    val dropped = result.filter(!col("keep")).count()
    assert(dropped > 0, "tau never fired — threshold no longer fixture-scaled")
    assert(dropped < n, "everything dropped — dominance rule degenerate")
  }

  test("dominance decisions match the paper's upper-triangular rule exactly") {
    // Rebuild the dropped/kept decision on the driver and check the
    // rule the implementation (and SemDeDup's released algorithm)
    // actually promises: v is dropped iff SOME more-central
    // near-duplicate u precedes it in the cell order — the witness u
    // need not itself survive (cosine is not transitive, so a chain
    // a~b, b~c, a!~c drops both b and c; see the scaladoc).
    val m = SemDedup.assignment(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2), r.getLong(3)))
    val keep = result.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    def sim(a: Array[Float], b: Array[Float]): Double =
      BigDecimal(a.iterator.zip(b.iterator).map { case (x, y) => x.toDouble * y.toDouble }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dominates(u: (Long, Array[Float], Long, Long), v: (Long, Array[Float], Long, Long)) =
      u._3 == v._3 && u._1 != v._1 &&
        (u._4 < v._4 || (u._4 == v._4 && u._1 < v._1)) &&
        sim(u._2, v._2) >= SemDedup.Tau
    m.foreach { v =>
      val hasDominator = m.exists(u => dominates(u, v))
      assert(keep(v._1) == !hasDominator,
        s"vec ${v._1}: keep=${keep(v._1)} but hasDominator=$hasDominator")
    }
  }

  test("kept set is closed under the cell partition: no cross-cell influence") {
    // A vector's fate depends only on its own cell: recompute per-cell
    // drop counts and check they sum to the global drop count (sanity
    // that the equi-join really is cell-local).
    val perCell = result.groupBy("cid")
      .agg(sum(when(col("keep"), 0L).otherwise(1L)).as("d"))
      .agg(sum("d")).head().getLong(0)
    val global = result.filter(!col("keep")).count()
    assert(perCell == global)
  }

  test("scale knob: larger k shrinks cells and bounds the pair work") {
    // Production sizing is k ~ n/targetCell; verify the knob actually
    // cuts the quadratic term: sum(cell^2) with k=32 must be well under
    // the k=8 default on the same data.
    def pairWork(k: Int): Long =
      graft.sim.SemDedup.assignment(spark, sf001, k)
        .groupBy("cid").count().collect()
        .map(r => r.getLong(1) * r.getLong(1)).sum
    val (w8, w32) = (pairWork(8), pairWork(32))
    assert(w32 < w8 / 2, s"k=32 pair work $w32 !< half of k=8's $w8")
    // and the dedup result at k=32 is still a total partition with drops
    val r32 = graft.sim.SemDedup.semDedup(SemDedup.Tau, 32)(spark, sf001)
    assert(r32.count() == SimOps.embeddings(spark, sf001).count())
  }

  test("plan shape: candidate generation is a cid equi-join, no cartesian") {
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"semdedup planned a cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"semdedup planned a nested-loop join:\n$plan")
  }
}
