package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale diagnostic main: evidence that the clustered pc layouts'
  * ROW-GROUP PRUNING still engages on a ScaleGen scale-stress fixture
  * (`ScaleDiag <sfDir>`), not just on the canonical SFs — key-shifted
  * copies re-hash every coordinate, so the claim "the layout prunes at
  * N×" deserves a measurement, not an assumption (r10 verdict item 6).
  *
  * For each layout-backed band query it prints the LAYOUT scan's
  * post-pruning output rows against the table's total rows: a prune
  * fraction far below 1.0 at N× is the direct evidence that the
  * grid/z-order/quadtree clustering keeps paying as the fixture grows
  * (the synthesized coordinates are uniform over a FIXED domain, so
  * selectivity-preserving growth is the designed property — this main
  * verifies it held).
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalSession("32")
    graft.pc.PcQueries.prebuildLayouts(spark, sfDir)
    val total = graft.pc.Points.fromLineitem(spark, sfDir).count()

    def scanRows(df: DataFrame): Seq[(String, Long)] = {
      // collect() (not a noop WRITE: the write action plans its OWN
      // query execution, leaving this df's plan unexecuted and its
      // metrics zero) — result sizes here are bounded (rect ≈ 0.5% of
      // the table, knn = k, sample = 1%)
      df.collect()
      // recurse into AQE query stages: a post-shuffle plan's scans live
      // inside materialized QueryStageExec subtrees, not in the
      // top-level plan's leaves
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p.collect {
        case s: FileSourceScanExec => Seq(s)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
      scans(df.queryExecution.executedPlan).map { s =>
        val path = s.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("?")
        path -> s.metrics("numOutputRows").value
      }
    }

    val queries: Seq[(String, DataFrame)] = Seq(
      "pc_srect_grid" ->
        graft.pc.PcQueries.rectOnGrid(graft.pc.PcQueries.sRect)(spark, sfDir),
      "pc_srect_zorder" ->
        graft.pc.PcQueries.rectOnZorder(graft.pc.PcQueries.sRect)(spark, sfDir),
      "pc_knn_grid" ->
        graft.pc.PcQueries.knnOnGrid(1000, 250.0)(spark, sfDir),
      "pc_sample_quad" ->
        graft.pc.PcQueries.sampleOnQuadtree(0.01)(spark, sfDir))
    queries.foreach { case (name, df) =>
      scanRows(df).foreach { case (scan, rows) =>
        println(f"$name%-18s scan=$scan%-28s rows_read=$rows%10d " +
          f"of $total%10d (${rows.toDouble / total}%.4f)")
      }
    }
    spark.stop()
  }
}
