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
    simLayoutFiles(spark, sfDir)
    relUnitGrowth(spark, sfDir)
    spark.stop()
  }

  /** Unit-of-work counts behind the rel 100×-band queries (r11 verdict
    * item 5): the wall-clock ratio at N× is only meaningful against the
    * measured growth of the quantity the plan is linear in — join
    * output rows, exploded pairs, wedges — not the table row count.
    * Run at 1× and N× and divide. */
  private def relUnitGrowth(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    val li = t("lineitem")
    println(f"rel_unit lineitem_rows=${li.count()}%d")
    // rel_order_rev_bucket: linear in the join output (urgent lineitems)
    val urgent = li.join(t("orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey")).count()
    println(f"rel_unit order_rev_bucket_join_rows=$urgent%d")
    // rel_part_suppliers: linear in the distinct (part, supp) pairs
    val pairs = li.select("l_partkey", "l_suppkey").distinct().count()
    println(f"rel_unit part_suppliers_distinct_pairs=$pairs%d")
    // rel_copurchase: linear in the per-basket exploded pairs Σ C(n,2)
    val basketPairs = li.groupBy("l_orderkey")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")))
      .head().getLong(0)
    println(s"rel_unit copurchase_exploded_pairs=$basketPairs")
    // rel_triangles: edges of the support-filtered graph, oriented
    // wedges (the e1⋈e2 pair work, = Σ_y indeg·outdeg), triangles out
    val e = graft.rel.RelQueries.copurchase(Int.MaxValue)(spark, sfDir)
      .select("p1", "p2")
    val deg = e.select(col("p1").as("p"))
      .unionByName(e.select(col("p2").as("p")))
      .groupBy("p").agg(count(lit(1)).as("deg"))
    val ed = e
      .join(deg.select(col("p").as("p1"), col("deg").as("d1")), Seq("p1"))
      .join(deg.select(col("p").as("p2"), col("deg").as("d2")), Seq("p2"))
    val fwd = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("p1") < col("p2"))
    val oriented = ed.select(
      when(fwd, col("p1")).otherwise(col("p2")).as("u"),
      when(fwd, col("p2")).otherwise(col("p1")).as("v")).localCheckpoint(true)
    val nEdges = oriented.count()
    val wedges = oriented.groupBy("v").agg(count(lit(1)).as("ind"))
      .join(oriented.groupBy("u").agg(count(lit(1)).as("outd")),
        col("v") === col("u"))
      .agg(sum(col("ind") * col("outd"))).head().getLong(0)
    val tri = graft.rel.RelQueries.triangles(spark, sfDir).count()
    println(f"rel_unit triangles_edges=$nEdges%d wedges=$wedges%d triangles=$tri%d")
  }

  /** The r11 §10 tiny-file lesson, generalized to the NON-pc layouts
    * (r11 verdict item 6): for each sim/rel derived layout, print the
    * data-file count against the row count at this SF. A layout whose
    * file count grows linearly with the data (tasks × partition-dirs
    * from an unrepartitioned `partitionBy` write) pays per-file
    * listing/footer/scheduling costs that swamp the pruning it exists
    * to provide — the failure `Layout.adaptiveBatchSize` fixed for the
    * pc layouts. Run at 1× and 100× and compare the file-count GROWTH,
    * not the absolute number. */
  private def simLayoutFiles(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Unit = {
    def countFiles(root: String): Long = {
      import scala.jdk.CollectionConverters._
      val rp = java.nio.file.Paths.get(root)
      val walk = java.nio.file.Files.walk(rp)
      try walk.iterator().asScala.count(f =>
        java.nio.file.Files.isRegularFile(f) &&
          rp.relativize(f).iterator().asScala.forall(s =>
            graft.sim.Ivf2.isVisibleName(s.toString)))
      finally walk.close()
    }
    val layouts: Seq[(String, () => String)] = Seq(
      // r13: the posting write moved onto the layoutWrite range
      // discipline — this row is the file-count-∝-rows evidence
      ("posting_index", () =>
        graft.text.TextOps.postingIndexPath(spark, sfDir) + "/postings"),
      ("ann_layout", () => graft.sim.SimOps.annLayoutPath(spark, sfDir)),
      ("ivf_layout", () => graft.sim.Ivf.layoutPath(spark, sfDir)),
      ("ivf2_layout", () => graft.sim.Ivf2.layout2Path(spark, sfDir)),
      ("sq8_codes_layout", () => graft.sim.Sq8.codesLayoutPath(spark, sfDir)),
      ("pq_codes_layout", () => graft.sim.Pq.codesLayoutPath(spark, sfDir)),
      ("bucket_orders", () => {
        val (ord, _) = graft.rel.RelQueries.bucketedTables(spark, sfDir)
        spark.sql(s"DESCRIBE FORMATTED $ord").filter("col_name = 'Location'")
          .head().getString(1).stripPrefix("file:")
      }),
      ("bucket_lineitem", () => {
        val (_, li) = graft.rel.RelQueries.bucketedTables(spark, sfDir)
        spark.sql(s"DESCRIBE FORMATTED $li").filter("col_name = 'Location'")
          .head().getString(1).stripPrefix("file:")
      }))
    layouts.foreach { case (name, build) =>
      val path = build()
      val files = countFiles(path)
      val rows = spark.read.parquet(path).count()
      println(f"layout $name%-18s files=$files%7d rows=$rows%10d " +
        f"rows/file=${rows.toDouble / math.max(files, 1)}%12.1f")
    }
  }
}
