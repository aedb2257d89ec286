package graft

import org.apache.spark.sql.functions._
import graft.pc.{PcQueries, PointCloudStore, Points}

/** The in-memory chunk store (S2/D7): query equivalence with the flat
  * path, cell-skip predicate soundness, and cell-routed append. */
class PointCloudStoreSpec extends SparkSpec {

  private lazy val points = Points.fromLineitem(spark, sf0001)

  test("store queries return exactly the flat-path results") {
    val store = PointCloudStore(points, sigma = 4, batchSize = 2048L)
    try {
      for (box <- Seq(PcQueries.sRect, PcQueries.mRect, PcQueries.vizCell)) {
        val want = points.filter(Points.boxPredicate(box))
          .agg(count(lit(1)), coalesce(sum("pid"), lit(0L))).head()
        val got = store.query(box)
          .agg(count(lit(1)), coalesce(sum("pid"), lit(0L))).head()
        assert(got == want, s"box $box: store=$got flat=$want")
      }
      assert(store.count() == points.count())
    } finally store.unpersist()
  }

  test("cell-routed append integrates new batches") {
    val half1 = points.filter(col("pid") % 2 === 0)
    val half2 = points.filter(col("pid") % 2 =!= 0)
    val store = PointCloudStore(half1, sigma = 4, batchSize = 2048L)
    try {
      val before = store.count()
      store.append(half2)
      assert(store.count() == points.count() && before < points.count())
      val box = PcQueries.sRect
      val want = points.filter(Points.boxPredicate(box)).count()
      assert(store.query(box).count() == want)
    } finally store.unpersist()
  }

  test("bounds come from the cached table in one aggregate") {
    val store = PointCloudStore(points, sigma = 4, batchSize = 2048L)
    try {
      val b = store.bounds()
      assert(b.names == Vector("x", "y", "z", "i"))
      assert(b.lower(0) >= 0.0 && b.upper(0) < 1000.0)
      assert(b.upper(3) < 1.0)
    } finally store.unpersist()
  }
}
