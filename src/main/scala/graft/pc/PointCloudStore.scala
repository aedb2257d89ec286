package graft.pc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** In-memory point-cloud table (reference `PointCloud`,
  * pc-format/src/pointcloud.rs:33-171): a cell-keyed chunk store with
  * query-time chunk skipping and memory/disk tiering.
  *
  * Spark redesign: the "concurrent map of cell → chunk" becomes ONE
  * cached DataFrame hash-partitioned by the cell id; Spark's block
  * manager is the spill machinery (MEMORY_AND_DISK replaces the
  * reference's moka-cache → Arrow-IPC eviction, S7), and chunk skipping
  * is a cell-id predicate evaluated before the row predicate — at scale
  * the cell filter prunes cached partitions via partition-level
  * statistics of the in-memory columnar cache (Spark caches per-batch
  * min/max and skips batches on filter).
  *
  * `append` is the reference's cell-routed append (D7): new batches are
  * assigned cell ids by expression and unioned in; the cache is rebuilt
  * lazily on next query.
  */
final class PointCloudStore private (
    val geometry: Layout.GridGeometry,
    initial: DataFrame,
    level: StorageLevel) {

  private var data: DataFrame = withCells(initial)
  private var cached: Option[DataFrame] = None

  private def withCells(df: DataFrame): DataFrame =
    df.select(col("*") +: geometry.cellCols(df): _*)

  /** D7: route new rows to cells. Invalidates the cache. */
  def append(batch: DataFrame): Unit = synchronized {
    cached.foreach(_.unpersist())
    cached = None
    data = data.unionByName(withCells(batch))
  }

  /** The cached, cell-partitioned table (built lazily). */
  def table: DataFrame = synchronized {
    cached.getOrElse {
      val t = data
        .repartition(geometry.cellNames.map(col): _*)
        .sortWithinPartitions(geometry.cellNames.map(col): _*)
        .persist(level)
      cached = Some(t)
      t
    }
  }

  /** Cell-id predicate for a query box: TRUE for every cell the box can
    * touch — the chunk-skip phase of the reference's scan (S2). */
  def cellPredicate(box: Aabb): Column = {
    val conds = box.names.indices.flatMap { d =>
      // z is never a partitioning axis (reference quirk, SURVEY §1.5)
      val cellAndScale = box.names(d) match {
        case "x" => Some((col("cell_x"), geometry.cellEdge))
        case "y" => Some((col("cell_y"), geometry.cellEdge))
        case "i" => Some((col("cell_i"), 1.0 / geometry.sigma))
        case _ => None
      }
      cellAndScale.toSeq.flatMap { case (cellCol, scale) =>
        // conservative: include the boundary cell at the open upper edge
        Seq(cellCol >= math.floor(box.lower(d) / scale).toLong,
          cellCol <= math.floor(box.upper(d) / scale).toLong)
      }
    }
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Range query: cell skip, then exact row filter (two-phase, like
    * PointCloudExec — pc-format/src/exec.rs:87-144). */
  def query(box: Aabb): DataFrame =
    table.filter(cellPredicate(box) && Points.boxPredicate(box))
      .drop(geometry.cellNames: _*)

  def count(): Long = table.count()

  def bounds(dims: Seq[String] = Seq("x", "y", "z", "i")): Aabb =
    Points.dataBounds(table, dims)

  def unpersist(): Unit = synchronized {
    cached.foreach(_.unpersist()); cached = None
  }
}

object PointCloudStore {
  /** Build a store from a point DataFrame; geometry derived from the data
    * like the grid(σ) partitioner (D5). */
  def apply(points: DataFrame, sigma: Int = 8,
      batchSize: Long = Layout.BatchSize,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): PointCloudStore = {
    val (bounds, count) = Layout.boundsAndCount(points)
    val geo = Layout.gridGeometry(bounds, count, sigma, batchSize)
    new PointCloudStore(geo, points, level)
  }
}
