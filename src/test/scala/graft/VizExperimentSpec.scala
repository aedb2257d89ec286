package graft

import java.nio.file.Files

import graft.pc.{Layout, Points, VizExperiment}

/** 16-probe-per-level viz workload over a quadtree LoD layout. */
class VizExperimentSpec extends SparkSpec {

  test("probe schedule: ~M probes per level, every level covered") {
    val box = graft.pc.Aabb.xyi(0, 0, 0, 1024, 1024, 1.0)
    val probes = VizExperiment.selectProbes(box, depth = 3, m = 16)
    val byLevel = probes.groupBy(_.level).view.mapValues(_.size).toMap
    assert(byLevel.keySet == Set(0, 1, 2, 3))
    assert(byLevel(0) == 16) // 1 cell repeated 16x
    assert(byLevel(1) == 16) // 4 cells repeated 4x
    assert(byLevel(2) == 16) // 16 cells, stride 1
    assert(byLevel(3) == 16) // 64 cells, stride 4
  }

  test("scan arm and index arm agree; the index is selective at leaf levels") {
    val dir = Files.createTempDirectory("viz").toString
    val pts = Points.withImportance(
      Points.fromLineitem(spark, sf001).select("x", "y", "pid"), seed = 7L)
    val geo = Layout.writeQuadtree(pts, dir, batchSize = 2048L)
    val report = VizExperiment.run(spark, dir, geo.box, geo.depth).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      val (rows, upper, hit, total) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(rows <= upper, s"exact $rows > candidate bound $upper")
      assert(hit <= total)
    }
    // every point of the cloud is owned by exactly one cell per level,
    // so each level's probes can't overcount the table
    val table = pts.count()
    val deepest = report.filter(_.getInt(0) == geo.depth)
    assert(deepest.nonEmpty)
    // leaf cells are small: the footer index must skip most row groups
    val avgHitFrac = deepest.map(r => r.getLong(3).toDouble / r.getLong(4)).sum / deepest.size
    assert(avgHitFrac < 0.5, s"leaf probes hit $avgHitFrac of row groups on average")
    // distinct rows: shallow levels REPEAT probes (max(1, m/4^l) copies),
    // so a raw sum over repeats could legitimately exceed the table
    assert(deepest.map(r => (r.getLong(1), r.getLong(2))).distinct.map(_._1).sum <= table)
  }
}
