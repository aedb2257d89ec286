package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pc.Aabb

/** Pure-math specs, including the reference's own test values
  * (pc-format/src/framework.rs:221-246). */
class AabbSpec extends AnyFunSuite {

  test("grid coverage matches reference test: delta=1 over [-0.9,0.9]^3 => 8 cells") {
    val box = Aabb(Vector("x", "y", "z"), Vector(-0.9, -0.9, -0.9), Vector(0.9, 0.9, 0.9))
    val cells = Aabb.gridCoverage(box, Seq(1.0, 1.0, 1.0))
    assert(cells.size == 8)
    // cells are aligned to integer multiples of delta
    assert(cells.forall(c => c.lower.forall(v => v == -1.0 || v == 0.0)))
  }

  test("split produces quasi-equal slices snapping to exact corners") {
    val box = Aabb.xy(0.0, 0.0, 10.0, 9.0)
    val parts = box.split(Seq(3, 2))
    assert(parts.size == 6)
    assert(parts.head.lower == Vector(0.0, 0.0))
    assert(parts.last.upper == Vector(10.0, 9.0))
    // x slices: [0,10/3),[10/3,20/3),[20/3,10)
    val xs = parts.map(p => (p.lower(0), p.upper(0))).distinct.sorted
    assert(xs.size == 3 && xs.head._1 == 0.0 && xs.last._2 == 10.0)
  }

  test("quadtree cells: depth 2 => 1 + 4 + 16 = 21 cells with layered importance") {
    val box = Aabb.xyi(0.0, 0.0, 0.0, 1000.0, 1000.0, 1.0)
    val cells = Aabb.quadtreeCells(box, 2)
    assert(cells.size == 21)
    // level 0: importance [0, 1/21)
    assert(cells.head.lower(2) == 0.0 && cells.head.upper(2) == 1.0 / 21.0)
    // last level closed at 1.0
    assert(cells.last.upper(2) == 1.0)
    // levels partition importance: slices are contiguous
    val slices = cells.map(c => (c.lower(2), c.upper(2))).distinct.sortBy(_._1)
    assert(slices.size == 3)
    assert(slices.sliding(2).forall { case Seq(a, b) => a._2 == b._1 })
  }

  test("every point lands in exactly one quadtree cell (disjoint + complete)") {
    val box = Aabb.xyi(0.0, 0.0, 0.0, 8.0, 8.0, 1.0)
    val cells = Aabb.quadtreeCells(box, 2)
    val rng = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val p = Seq(rng.nextDouble() * 8, rng.nextDouble() * 8, rng.nextDouble())
      val owners = cells.filter(_.contains(p))
      assert(owners.size == 1, s"point $p in ${owners.size} cells")
    }
    // the importance=1.0 edge is owned (closed upper bound on last level)
    val edge = Seq(3.0, 3.0, 1.0)
    assert(cells.count(_.contains(edge)) == 1)
  }

  test("every point lands in exactly one grid(sigma) cell") {
    val bounds = Aabb.xy(0.0, 0.0, 1000.0, 1000.0)
    val (cells, _) = Aabb.gridPartitionCells(bounds, 4L * 524288L, sigma = 8)
    val rng = new scala.util.Random(11)
    (1 to 2000).foreach { _ =>
      val p = Seq(rng.nextDouble() * 1000, rng.nextDouble() * 1000, rng.nextDouble())
      val owners = cells.filter(_.contains(p))
      assert(owners.size == 1, s"point $p in ${owners.size} cells")
    }
  }

  test("aabb merge / intersects / withImportance / id") {
    val a = Aabb.xy(0, 0, 2, 2)
    val b = Aabb.xy(1, 1, 3, 3)
    assert(a.intersects(b))
    assert(a.merge(b) == Aabb.xy(0, 0, 3, 3))
    assert(!a.intersects(Aabb.xy(2, 2, 4, 4))) // half-open: touching != overlap
    val lifted = a.withImportance(0.25, 0.5)
    assert(lifted.names == Vector("x", "y", "i"))
    assert(lifted.lower(2) == 0.25 && lifted.upper(2) == 0.5)
    assert(a.id == "x-0.0-2.0y-0.0-2.0")
  }
}
