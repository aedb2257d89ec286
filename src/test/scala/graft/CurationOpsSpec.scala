package graft

import org.apache.spark.sql.functions._
import graft.rel.RelQueries
import graft.sim.{SemDedup, SimOps}

/** The cluster-curation wave: cluster-balanced sampling, cluster topic
  * labeling, and co-purchase triangle enumeration — each pinned against
  * a literal re-derivation of its definition on the real fixture. */
class CurationOpsSpec extends SparkSpec {

  test("clusterSample keeps exactly ceil(frac * |cell|) per cell, all from the cell") {
    val frac = 250000L // 25%
    val got = SimOps.clusterSample(frac)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val assign = SemDedup.assignment(spark, sf001)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every sampled vector carries its true cell
    got.foreach { case (v, c) => assert(assign(v) == c, s"vec $v wrong cell") }
    // per-cell quota is exactly ceil(n * frac / 1e6)
    val cellSizes = assign.values.groupBy(identity).map { case (c, vs) => (c, vs.size.toLong) }
    val quota = cellSizes.map { case (c, n) => (c, (n * frac + 999999L) / 1000000L) }
    val kept = got.groupBy(_._2).map { case (c, vs) => (c, vs.length.toLong) }
    assert(kept == quota, s"per-cell quotas diverge: got $kept want $quota")
    // no cell is emptied (quota >= 1 for nonempty cells)
    assert(cellSizes.keySet == kept.keySet, "a nonempty cell lost all members")
  }

  test("clusterSample is the hash-order prefix of each cell (deterministic, unbiased)") {
    val got = SimOps.clusterSample(250000L)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val assign = SemDedup.assignment(spark, sf001)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def hk(v: Long): Long = graft.functions.Md5Prefix.digestBits(
      v.toString.getBytes("UTF-8"), 0, 60)
    assign.groupBy(_._2).foreach { case (c, members) =>
      val n = members.length.toLong
      val q = ((n * 250000L + 999999L) / 1000000L).toInt
      val want = members.map(_._1).sortBy(v => (hk(v), v)).take(q).toSet
      assert(want.forall(v => got.contains((v, c))),
        s"cell $c sample is not the (md5, id)-order prefix")
    }
  }

  test("clusterTerms: per-cell top-3 terms match a literal per-cell recount") {
    val got = SimOps.clusterTerms(3)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.forall(_._4 <= 3))
    val assign = SemDedup.assignment(spark, sf001)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.flatMap { case (id, text) =>
      text.split(" ").map(t => ((assign(id), t), 1L))
    }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    // for each cell, the query's rows are the (tf desc, term asc) top-3
    got.groupBy(_._1).foreach { case (cell, rows) =>
      val want = counts.collect { case ((c, t), n) if c == cell => (t, n) }
        .toSeq.sortBy { case (t, n) => (-n, t) }.take(rows.length)
      val gotCell = rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      assert(gotCell == want, s"cell $cell top terms diverge: $gotCell vs $want")
    }
  }

  test("triangles: degree-oriented enumeration == literal brute force over the edge set") {
    val got = RelQueries.triangles(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force: materialize support-filtered edges, test all triples
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }
    // NB: .filter + .keySet, NOT Map.collect{ case (e, _) => e } — a
    // collect yielding tuples from a Map rebuilds a MAP keyed by p1 and
    // silently collapses parallel edges
    val edges = pairs.groupBy(identity)
      .filter(_._2.size >= RelQueries.CopurchaseSupport).keySet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = verts.map(v => v -> edges.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }).toMap
    val want = (for {
      a <- verts; b <- adj(a) if b > a; c <- adj(b) if c > b
      if edges.contains((a, c))
    } yield (a, b, c)).toSet
    assert(got.toSet == want && got.length == want.size,
      s"got ${got.length} triangles, brute force found ${want.size}")
    // output is canonical and globally ordered
    assert(got.forall { case (a, b, c) => a < b && b < c })
    assert(got.sorted.sameElements(got), "triples must arrive ordered")
  }

  test("triangles: each triple is emitted exactly once (orientation canonicalization)") {
    val got = RelQueries.triangles(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.distinct.length == got.length, "duplicate triangle emitted")
  }
}
