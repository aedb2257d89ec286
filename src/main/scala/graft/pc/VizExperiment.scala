package graft.pc

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Visualization-workload experiment (reference:
  * pc-cli/examples/viz.rs:158-271): probe ~M quadtree LoD cells per level
  * against a clustered layout and compare the two read paths the paper
  * measures —
  *
  *  1. the engine scan (Parquet pushdown + native row-group pruning;
  *     the reference's DataFusion arm), and
  *  2. the external row-group index (footer min/max stats queried
  *     driver-side; the reference's R-tree arm — at our scale a linear
  *     envelope intersection over footer stats is the same index).
  *
  * Probe selection mirrors viz.rs: level ℓ has 4^ℓ cells; take every
  * `max(1, 4^ℓ/M)`-th cell, repeated `max(1, M/4^ℓ)` times, so every
  * level contributes ≈M probes.
  *
  * Per probe we report exact result rows plus the index arm's row-group
  * hits and candidate-row upper bound — the paper's claim (native
  * pruning ≈ external index on a clustered layout) becomes checkable as
  * `rows <= rows_upper << table_rows` with `rg_hit << rg_total`.
  */
object VizExperiment {

  final case class Probe(level: Int, cell: Aabb)

  /** viz.rs probe schedule over [[Aabb.quadtreeCells]] cell order. */
  def selectProbes(box: Aabb, depth: Int, m: Int = 16): Seq[Probe] = {
    val cells = Aabb.quadtreeCells(box, depth)
    var offset = 0
    (0 to depth).flatMap { level =>
      val n = math.pow(4.0, level).toInt
      val levelCells = cells.slice(offset, offset + n)
      offset += n
      val stride = math.max(1, n / m)
      val repeat = math.max(1, m / n)
      levelCells.zipWithIndex.collect {
        case (c, i) if i % stride == 0 => Seq.fill(repeat)(Probe(level, c))
      }.flatten
    }
  }

  /** Run all probes against a quadtree layout at `path`. Output one row
    * per probe: (level, rows, rows_upper, rg_hit, rg_total). */
  def run(spark: SparkSession, path: String, box: Aabb, depth: Int,
      m: Int = 16): DataFrame = {
    val stats = Layout.rowGroupStats(spark, path, Seq("x", "y", "i"))
    val rgTotal = stats.size.toLong
    // the R-tree arm: bulk-loaded once per layout, O(log n + k) per probe
    val index = Layout.RowGroupIndex.build(stats, Seq("x", "y", "i"))
    val df = spark.read.parquet(path)
    val rows = selectProbes(box, depth, m).map { p =>
      // arm 1: engine scan with pushdown (native row-group pruning)
      val exact = df.filter(Points.boxPredicate(p.cell)).count()
      // arm 2: external footer-stats R-tree, driver-side descent
      val hit = index.query(p.cell)
      Row(p.level, exact, hit.map(_.rows).sum, hit.size.toLong, rgTotal)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("level", IntegerType, nullable = false),
        StructField("rows", LongType, nullable = false),
        StructField("rows_upper", LongType, nullable = false),
        StructField("rg_hit", LongType, nullable = false),
        StructField("rg_total", LongType, nullable = false))))
  }
}
