package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pc.Aabb

/** ScalaCheck properties for the partitioning geometry: the disjointness/
  * completeness invariants (SURVEY.md §7.4.1) that make cell layouts
  * result-preserving — every point belongs to EXACTLY one cell, under
  * random boxes, deltas, depths and points (including the importance
  * upper-boundary i=1.0, which must land in the closed last slice). */
class CellPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, s"$name failed: ${r.status}")
  }

  private val genBox: Gen[Aabb] = for {
    x0 <- Gen.choose(-500.0, 500.0); w <- Gen.choose(1.0, 800.0)
    y0 <- Gen.choose(-500.0, 500.0); h <- Gen.choose(1.0, 800.0)
  } yield Aabb.xy(x0, y0, x0 + w, y0 + h)

  private def genPointIn(box: Aabb, withI: Boolean): Gen[Seq[Double]] = for {
    // fractions in [0,1] inclusive so upper edges get exercised
    fs <- Gen.listOfN(box.rank, Gen.oneOf(Gen.choose(0.0, 1.0), Gen.oneOf(0.0, 1.0)))
    i <- Gen.oneOf(Gen.choose(0.0, 1.0), Gen.const(1.0))
  } yield {
    val p = box.names.indices.map(d =>
      box.lower(d) + fs(d) * (box.upper(d) - box.lower(d)))
    if (withI) p :+ i else p
  }

  test("grid coverage: cells tile the box; interior points in exactly one cell") {
    check("gridCoverage", Prop.forAll(genBox, Gen.choose(0.5, 200.0)) { (box, delta) =>
      val cells = Aabb.gridCoverage(box, Seq(delta, delta))
      Prop.forAll(genPointIn(box, withI = false)) { p =>
        // a grid cell is right-open; a point on the box's upper edge may
        // fall in the next cell outside the coverage, so only points
        // strictly inside must be covered exactly once
        val inside = box.names.indices.forall(d => p(d) < box.upper(d))
        !inside || cells.count(_.contains(p)) == 1
      }
    })
  }

  test("quadtree LoD cells: every (x,y,i) point in exactly one cell, incl i=1.0") {
    val genDepth = Gen.choose(0, 3)
    check("quadtreeCells", Prop.forAll(genBox, genDepth) { (xy, depth) =>
      val box = Aabb.xyi(xy.lower(0), xy.lower(1), 0.0, xy.upper(0), xy.upper(1), 1.0)
      val cells = Aabb.quadtreeCells(box, depth)
      Prop.forAll(genPointIn(xy, withI = true)) { p =>
        val inside = (0 to 1).forall(d => p(d) < xy.upper(d))
        !inside || cells.count(_.contains(p)) == 1
      }
    })
  }

  test("split: slices are disjoint and complete over the box") {
    val genSplits = Gen.listOfN(2, Gen.choose(1, 7))
    check("split", Prop.forAll(genBox, genSplits) { (box, splits) =>
      val slices = box.split(splits)
      slices.size == splits.product && Prop.forAll(genPointIn(box, withI = false)) { p =>
        val inside = box.names.indices.forall(d => p(d) < box.upper(d))
        !inside || slices.count(_.contains(p)) == 1
      }
    })
  }

  test("cell ids are unique within a coverage (routing key safety)") {
    check("cellIds", Prop.forAll(genBox, Gen.choose(1.0, 100.0)) { (box, delta) =>
      val cells = Aabb.gridCoverage(box, Seq(delta, delta))
      cells.map(_.id).distinct.size == cells.size
    })
  }
}
