package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pc.PcQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or the
  * training-data extension surface), and has a matching DuckDB oracle in
  * `oracleSql` unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * S_RECT: the reference's headline half-open rectangle range query over
    * the synthesized point cloud. */
  def entry(spark: SparkSession): DataFrame =
    PcQueries.rect(PcQueries.sRect)(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference benchmark surface (SURVEY.md §2.2/2.3/2.6, BASELINE.md)
    "pc_count" -> (PcQueries.pcCount(_, _)),
    "pc_bounds" -> (PcQueries.pcBounds(_, _)),
    "pc_srect" -> (PcQueries.rect(PcQueries.sRect)(_, _)),
    "pc_mrect" -> (PcQueries.rect(PcQueries.mRect)(_, _)),
    "pc_scirc" -> (PcQueries.circle(
      PcQueries.sCircle._1, PcQueries.sCircle._2, PcQueries.sCircle._3)(_, _)),
    "pc_mcirc" -> (PcQueries.circle(
      PcQueries.mCircle._1, PcQueries.mCircle._2, PcQueries.mCircle._3)(_, _)),
    "pc_sample_s" -> (PcQueries.sample(0.002)(_, _)),
    "pc_sample_m" -> (PcQueries.sample(0.01)(_, _)),
    "pc_sample_l" -> (PcQueries.sample(0.05)(_, _)),
    "pc_knn_100" -> (PcQueries.knn(100, 100.0)(_, _)),
    "pc_knn_1000" -> (PcQueries.knn(1000, 250.0)(_, _)),
    "pc_viz_cell" -> (PcQueries.viz(_, _)),
    // -- data-organization operators as relational queries (SURVEY.md §2.7)
    "pc_grid_cells" -> (PcQueries.gridCells(_, _)),
    "pc_quadtree_assign" -> (PcQueries.quadtreeAssign(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "pc_count" -> PcQueries.pcCountSql,
    "pc_bounds" -> PcQueries.pcBoundsSql,
    "pc_srect" -> PcQueries.rectSql(PcQueries.sRect),
    "pc_mrect" -> PcQueries.rectSql(PcQueries.mRect),
    "pc_scirc" -> PcQueries.circleSql(
      PcQueries.sCircle._1, PcQueries.sCircle._2, PcQueries.sCircle._3),
    "pc_mcirc" -> PcQueries.circleSql(
      PcQueries.mCircle._1, PcQueries.mCircle._2, PcQueries.mCircle._3),
    "pc_sample_s" -> PcQueries.sampleSql(0.002),
    "pc_sample_m" -> PcQueries.sampleSql(0.01),
    "pc_sample_l" -> PcQueries.sampleSql(0.05),
    "pc_knn_100" -> PcQueries.knnSql(100, 100.0),
    "pc_knn_1000" -> PcQueries.knnSql(1000, 250.0),
    "pc_viz_cell" -> PcQueries.vizSql,
    "pc_grid_cells" -> PcQueries.gridCellsSql,
    "pc_quadtree_assign" -> PcQueries.quadtreeAssignSql,
  )
}
