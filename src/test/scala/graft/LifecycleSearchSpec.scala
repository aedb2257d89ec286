package graft

import org.apache.spark.sql.functions._

import graft.sim.{Ivf2, SimOps}

/** The composed lifecycle search (base ∪ delta − DV): the fixture must
  * actually exercise every leg — results draw from BOTH segments over
  * the index's life, the union-derived kill-list is non-empty, and no
  * killed vector is ever returned. */
class LifecycleSearchSpec extends SparkSpec {

  private def union(dir: String) = {
    val (coarse, cents) = Ivf2.appendCodebooks(spark, dir)
    Ivf2.assignFrozenFull(SimOps.embeddings(spark, dir), coarse, cents)
  }

  /** The spec's own replay of the union-dominance kill-list. */
  private def killSet(dir: String): Set[Long] = {
    val m = union(dir)
    val u = m.select(col("vec_id").as("u_id"), col("embedding").as("u_emb"),
      col("c1"), col("scid"), col("dist").as("u_dist"))
    val v = m.select(col("vec_id").as("v_id"), col("embedding").as("v_emb"),
      col("c1"), col("scid"), col("dist").as("v_dist"))
    u.join(v, Seq("c1", "scid"))
      .filter(col("u_id") =!= col("v_id"))
      .filter(col("u_dist") < col("v_dist") ||
        (col("u_dist") === col("v_dist") && col("u_id") < col("v_id")))
      .filter(round(SimOps.dot(col("u_emb"), col("v_emb")), 6) >= graft.sim.SemDedup.Tau)
      .select("v_id").distinct().collect().map(_.getLong(0)).toSet
  }

  test("lifecycle search returns k live results and excludes every killed vector") {
    val kill = killSet(sf001)
    assert(kill.nonEmpty, "fixture regression: empty union kill-list")
    val got = Ivf2.lifecycleSearch(0L, 10, 2, 4)(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    assert(got.forall(p => !kill(p._1)), "killed id in lifecycle result")
    // descending-sim order with the (sim, vec_id) tie rule
    got.sliding(2).foreach { case Array((i1, s1), (i2, s2)) =>
      assert(s1 > s2 || (s1 == s2 && i1 < i2))
    }
  }

  test("exhaustive-probe lifecycle search equals the exact live-union top-k (delta leg non-vacuous)") {
    val n = SimOps.embeddings(spark, sf001).count()
    val split = n / 2
    val kill = killSet(sf001)
    val m = union(sf001)
    // the delta (new-half) leg must contribute candidates at all
    assert(m.filter(col("vec_id") >= split).count() > 0)
    // with probe widths >= K1 / K1·K2 the probe is exhaustive, so the
    // operator must equal a from-scratch exact rescore of the live
    // union — base rows, delta rows, and the DV anti-join all at once
    val exhaustive = Ivf2.lifecycleSearch(0L, 10, 1000, 100000)(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val qe = SimOps.embeddings(spark, sf001)
      .filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val killDf = m.filter(col("vec_id").isInCollection(kill)).select("vec_id")
    val exact = m.join(killDf, Seq("vec_id"), "left_anti")
      .filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(qe))
      .select(col("vec_id"), round(SimOps.dot(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(exhaustive == exact,
      "exhaustive-probe lifecycle search != exact live-union top-k")
    // and the exact live top-k includes a delta vector, so the union
    // read is doing real work in this fixture
    assert(exact.exists(_._1 >= split),
      "fixture regression: no delta vector in the live top-10")
  }
}
