package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.mm.MultimodalOps
import graft.pc.Aabb

/** ScalaCheck properties for the round-2 driver-side math: these pure
  * functions feed distributed plans (resize metadata, layout geometry),
  * so their invariants must hold on ALL inputs, not just fixtures. */
class MathPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(500)
    .withInitialSeed(org.scalacheck.rng.Seed(76L))

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(params, prop)
    assert(r.passed, s"$name failed: ${r.status}")
  }

  test("resizeScale: bounded box, never upscales, identity when it fits") {
    val dims = Gen.choose(1, 20000)
    check("resizeScale", Prop.forAll(dims, dims, dims, dims) { (w, h, mw, mh) =>
      val s = MultimodalOps.resizeScale(w, h, mw, mh)
      val (nw, nh) = (math.floor(w * s).toInt, math.floor(h * s).toInt)
      s > 0.0 && s <= 1.0 &&
        nw <= mw && nh <= mh && // inside the box
        nw <= w && nh <= h && // never upscaled
        (!(w <= mw && h <= mh) || (nw == w && nh == h)) // fits => identity
    })
  }

  test("gridDerivation: positive cell size and >=1 splits on any bounds") {
    val coord = Gen.choose(-1e6, 1e6)
    val count = Gen.choose(0L, 1L << 40)
    val sigma = Gen.oneOf(1, 2, 4, 8, 16, 64, 256)
    check("gridDerivation", Prop.forAll(coord, coord, coord, coord, count, sigma) {
      (x0, y0, dx, dy, n, sg) =>
        // includes degenerate (zero-area) boxes when dx/dy round to 0
        val b = Aabb.xy(x0, y0, x0 + math.abs(dx), y0 + math.abs(dy))
        val (size, acc, splits) = Aabb.gridDerivation(b, n, sg)
        size > 0.0 && acc > 0.0 && splits >= 1
    })
  }

  test("quadtreeDerivation: depth is bounded and the box covers the bounds") {
    val coord = Gen.choose(-1e6, 1e6)
    val extent = Gen.choose(0.0, 1e5)
    val count = Gen.choose(0L, 1L << 40)
    check("quadtreeDerivation", Prop.forAll(coord, coord, extent, extent, count) {
      (x0, y0, dx, dy, n) =>
        val b = Aabb.xy(x0, y0, x0 + dx, y0 + dy)
        val (box, depth) = Aabb.quadtreeDerivation(b, n, 524288L)
        // depth stays sane even for degenerate bounds (the old code
        // saturated to ~22 on zero-area boxes); 2^40/512Ki => log4 ~ 10
        depth >= 0 && depth <= 12 &&
          box.lower(0) <= b.lower(0) && box.upper(0) >= b.upper(0) &&
          box.lower(1) <= b.lower(1) && box.upper(1) >= b.upper(1) &&
          box.lower(2) == 0.0 && box.upper(2) == 1.0
    })
  }

  test("hll estimate: monotone in used buckets at fixed harmonic mass") {
    import graft.events.EventOps
    // sanity over the full register range: estimates are positive and the
    // all-empty sketch estimates ~0 distinct
    val used = Gen.choose(0L, 64L)
    check("hllEstimate", Prop.forAll(used) { u =>
      val emptyWeight = 1L << 23
      // harmonic mass for u saturated registers (rank 1) + rest empty
      val harmonic = u * (1L << 22) + (64 - u) * emptyWeight
      val est = EventOps.hllEstimate(u, harmonic)
      est >= 0.0 && (u > 0 || est == 0.0)
    })
  }
}
