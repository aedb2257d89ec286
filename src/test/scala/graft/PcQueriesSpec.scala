package graft

import graft.pc.{PcQueries, PcSchema, Points}

class PcQueriesSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query in SparkEntry.queries runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every oracleSql key has a matching queries key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("synthesized points carry PC metadata and a valid pc schema") {
    val pts = Points.fromLineitem(spark, sf0001)
    val dims = PcSchema.dimensions(pts.schema)
    assert(dims.map(_.name) == Seq("x", "y", "z", "i"))
    assert(PcSchema.importance(pts.schema).map(_.name).contains("i"))
    assert(PcSchema.validate(pts.schema).isRight)
  }

  test("importance augmentation (D1) is seeded-deterministic and uniform-ish") {
    import org.apache.spark.sql.functions._
    val base = Points.fromLineitem(spark, sf0001).drop("i")
    val a = Points.withImportance(base, seed = 42L)
    val b = Points.withImportance(base, seed = 42L)
    assert(PcSchema.importance(a.schema).isDefined)
    val meanA = a.agg(avg("i")).head().getDouble(0)
    val meanB = b.agg(avg("i")).head().getDouble(0)
    assert(meanA == meanB, "same seed must give identical importance")
    assert(math.abs(meanA - 0.5) < 0.05, s"importance not uniform: mean $meanA")
    val bounds = a.agg(min("i"), max("i")).head()
    assert(bounds.getFloat(0) >= 0.0f && bounds.getFloat(1) < 1.0f)
  }

  test("knn returns exactly k rows ordered by distance") {
    val res = PcQueries.knn(50, 100.0)(spark, sf0001).collect()
    assert(res.length == 50)
    val ds = res.map(_.getDouble(1))
    assert(ds.sliding(2).forall { case Array(a, b) => a <= b })
  }

  test("sampling fraction selects approximately p*N points") {
    val total = PcQueries.pcCount(spark, sf001).head().getLong(0)
    val got = PcQueries.sample(0.05)(spark, sf001).head().getLong(0)
    val expect = 0.05 * total
    assert(math.abs(got - expect) < expect * 0.3, s"sampled $got, expected ~$expect")
  }

  test("circle result is subset of its bounding box result") {
    val (cx, cy, r) = PcQueries.sCircle
    val circ = PcQueries.circle(cx, cy, r)(spark, sf001).head().getLong(0)
    val bbox = PcQueries.rect(graft.pc.Aabb.xy(cx - r, cy - r, cx + r, cy + r))(
      spark, sf001).head().getLong(0)
    assert(circ <= bbox && circ > 0)
  }

  test("distance self-join equals a local brute force on the box subset") {
    import graft.pc.Points
    val r = 5.0
    val pts = Points.fromLineitem(spark, sf001)
      .filter(Points.boxPredicate(PcQueries.sRect))
      .select("pid", "x", "y").collect()
      .map(row => (row.getLong(0), row.getDouble(1), row.getDouble(2)))
    // brute force over the (small) box subset. The synthetic lineitem
    // contains duplicate (orderkey, linenumber) rows => duplicate pids
    // with identical coordinates; the join's pid < pid2 keeps one
    // orientation per DISTINCT-pid row pair and drops self-pid pairs,
    // exactly like the oracle's a.pid < b.pid — mirror that here
    val want = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      (p1, x1, y1) = pts(i); (p2, x2, y2) = pts(j)
      if p1 != p2
      if (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2) <= r * r
    } yield (math.min(p1, p2), p1 + p2)).toVector
    val got = PcQueries.distJoin(PcQueries.sRect, r)(spark, sf001).head()
    assert(got.getLong(0) == want.size.toLong,
      s"pair count ${got.getLong(0)} != brute ${want.size}")
    assert(got.getLong(1) == want.map(_._2).sum)
    assert(want.nonEmpty, "expected some close pairs in the box")
  }

  test("hausdorff equals a driver-side brute force") {
    val pts = Points.fromLineitem(spark, sf0001)
      .select("x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val want = pts.map { case (x, y) =>
      PcQueries.modelCloud.map { case (bx, by) =>
        (x - bx) * (x - bx) + (y - by) * (y - by)
      }.min
    }.max
    val row = PcQueries.hausdorff(spark, sf0001).head()
    assert(row.getLong(0) == pts.length.toLong)
    assert(row.getDouble(1) == want)
  }

  test("rotation sweep recovers a known rotation of the model cloud") {
    import org.apache.spark.sql.functions._
    // scan = model rotated by -60 deg about the rotation center; the
    // sweep's theta undoes it at +60, where the directed Hausdorff is 0
    val (cx, cy) = PcQueries.rotCenter
    val phi = math.toRadians(-60.0)
    val (c, s) = (math.cos(phi), math.sin(phi))
    val rotated = PcQueries.modelCloud.map { case (x, y) =>
      (cx + (x - cx) * c - (y - cy) * s, cy + (x - cx) * s + (y - cy) * c)
    }
    val df = spark.createDataFrame(rotated).toDF("x", "y")
    val sweep = PcQueries.registerSweep(df).collect()
    assert(sweep.map(_.getLong(0)).toSeq == PcQueries.registerAngles.map(_.toLong))
    val best = sweep.minBy(_.getDouble(1))
    assert(best.getLong(0) == 60L, s"argmin angle ${best.getLong(0)}")
    assert(best.getDouble(1) < 1e-18, s"residual ${best.getDouble(1)}")
    // every other angle leaves a visibly nonzero residual
    sweep.filter(_.getLong(0) != 60L).foreach { r =>
      assert(r.getDouble(1) > 1.0, s"angle ${r.getLong(0)} too close")
    }
  }

  test("knnRadius adapts to density: a 100x sparser cloud still yields the true k nearest") {
    // deterministic pseudo-uniform cloud, 600 points over [0,1000)^2 —
    // two orders of magnitude sparser than the testdata-derived cloud.
    // The PINNED radii (100/250, sized for the testdata density) find
    // almost nothing here; the measured-density radius must still
    // produce exactly the k nearest (reference behavior to match:
    // pc-cli/src/benchmark.rs:223-264 derives its box from density).
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val pts = spark.range(0, 600).select(col("id").as("pid"),
      (pmod(col("id") * 2654435761L, lit(1000000L)) / 1000.0).as("x"),
      (pmod(col("id") * 2246822519L + 123456L, lit(1000000L)) / 1000.0).as("y"))
    val k = 50
    val rAuto = PcQueries.knnRadius(pts, k)
    // the pinned-density radius really is wrong on this fixture
    val pinnedRows = PcQueries.knnOn(pts, k, 100.0, PcQueries.knnAt).count()
    assert(pinnedRows < k,
      s"fixture not sparse enough to discriminate: pinned radius found $pinnedRows")
    val auto = PcQueries.knnOn(pts, k, rAuto, PcQueries.knnAt).collect()
    assert(auto.length == k,
      s"density-derived box contained only ${auto.length} < $k points (r=$rAuto)")
    // and it is the TRUE top-k: identical to the un-bboxed brute force
    val (cx, cy) = PcQueries.knnAt
    val brute = pts
      .withColumn("d2",
        (col("x") - cx) * (col("x") - cx) + (col("y") - cy) * (col("y") - cy))
      .select("pid", "d2")
      .orderBy(col("d2").asc, col("pid").asc)
      .limit(k).collect()
    assert(auto.toSeq == brute.toSeq,
      "density-derived bbox clipped away part of the true k nearest")
  }

  test("cellCov: exact BigInt recount of one cell's moments; covariance derivable") {
    import org.apache.spark.sql.functions.{col, floor, round}
    val got = PcQueries.cellCov(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got.nonEmpty)
    val (cx, cy) = got.keys.head
    val pts = graft.pc.Points.fromLineitem(spark, sf001)
      .filter(floor(col("x") / 125.0) === cx && floor(col("y") / 125.0) === cy)
      .select(round(col("x") * 1000).cast("long"),
        round(col("y") * 1000).cast("long"),
        round(col("z") * 1000).cast("long"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val r = got((cx, cy))
    assert(r.getLong(2) == pts.length)
    assert(BigInt(r.getLong(3)) == pts.map(_._1).sum)
    assert(BigInt(r.getString(6)) == pts.map(p => p._1 * p._1).sum)
    assert(BigInt(r.getString(9)) == pts.map(p => p._1 * p._2).sum)
    assert(BigInt(r.getString(11)) == pts.map(p => p._2 * p._3).sum)
    // the moments suffice: cell covariance(x,y) derives without a second pass
    val n = BigInt(pts.length)
    val covXY = (n * pts.map(p => p._1 * p._2).sum -
      pts.map(_._1).sum * pts.map(_._2).sum)
    assert(covXY == n * BigInt(r.getString(9)) -
      BigInt(r.getLong(3)) * BigInt(r.getLong(4)))
  }
}
