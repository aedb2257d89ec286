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

  test("assocRules == literal per-pair confidence/lift recount") {
    val got = RelQueries.assocRules(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.nonEmpty)
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val itemN = li.groupBy(_._2).map { case (p, vs) => (p, vs.length.toLong) }
    val total = BigInt(li.map(_._1).distinct.length)
    val dirPairs: Seq[(Long, Long)] =
      li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val ps = rows.map(_._2).toSeq
        for (a <- ps; b <- ps if a != b) yield (a, b)
      }
    val pairCnt = dirPairs.groupBy(identity)
      .filter(_._2.size >= RelQueries.CopurchaseSupport)
      .map { case (k, vs) => (k, vs.size.toLong) }
    val want = pairCnt.map { case ((a, b), sup) =>
      val (na, nb) = (itemN(a), itemN(b))
      (a, b) -> ((sup, na, nb, sup * 1000000L / na,
        ((BigInt(sup) * total * 1000000) / (BigInt(na) * nb)).toLong))
    }
    assert(got == want, s"rules diverge: got ${got.size}, want ${want.size}")
    // metric sanity on real data: confidence ppm within (0, 1e6];
    // a support-2 pair on a sparse catalog lifts far above 1
    assert(got.values.forall { case (_, _, _, c, l) => c > 0 && c <= 1000000L && l > 1000000L })
  }

  test("cellRegions == driver-side BFS over the density-gated cell grid") {
    val got = graft.pc.PcQueries.cellRegions(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    assert(got.nonEmpty)
    // literal re-derivation: bucket, gate, BFS-label
    val pts = graft.pc.Points.fromLineitem(spark, sf001)
      .select(floor(col("x") / 25.0).cast("long").as("cx"),
        floor(col("y") / 25.0).cast("long").as("cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val total = pts.map(_._2).sum
    val occ = pts.length.toLong
    val core = pts.filter { case (_, c) => c * 10 * occ >= total * 11 }.toMap
    // BFS components over 4-adjacency
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    val regionOf = scala.collection.mutable.Map[(Long, Long), Long]()
    core.keys.toSeq.sorted.foreach { start =>
      if (!seen(start)) {
        val comp = scala.collection.mutable.Buffer(start)
        seen += start
        var i = 0
        while (i < comp.length) {
          val (x, y) = comp(i)
          Seq((x - 1, y), (x + 1, y), (x, y - 1), (x, y + 1)).foreach { nb =>
            if (core.contains(nb) && !seen(nb)) { seen += nb; comp += nb }
          }
          i += 1
        }
        val lbl = comp.map { case (x, y) => x * 1000 + y }.min
        comp.foreach(c => regionOf(c) = lbl)
      }
    }
    val want = core.map { case (cell, c) =>
      cell -> ((regionOf(cell),
        regionOf.count(_._2 == regionOf(cell)).toLong, c))
    }
    assert(got.toMap == want,
      s"regions diverge: got ${got.length} cells, want ${want.size}")
    // structure sanity: the gate keeps a strict subset, and at least one
    // multi-cell region exists on the real fixture
    assert(core.size < pts.length)
    assert(got.map(_._2._2).max >= 2, "fixture should produce a joined region")
  }

  test("containment pairs: score == inter/min(|A|,|B|), catches subset dups jaccard dilutes") {
    import graft.text.TextOps
    val tau = 0.5
    val got = TextOps.ngramContainmentPairs(tau)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // literal recount from distinct 3-shingle sets
    val sets = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ")
        (r.getLong(0), ws.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
      }.filter(_._2.nonEmpty).toMap
    got.foreach { case (d1, d2, inter, ppm) =>
      val i = (sets(d1) & sets(d2)).size.toLong
      assert(i == inter, s"($d1,$d2) inter $inter, recount $i")
      val p = i * 1000000L / math.min(sets(d1).size, sets(d2).size)
      assert(p == ppm && p >= 500000L, s"($d1,$d2) ppm $ppm, recount $p")
    }
    // completeness: every qualifying pair appears
    val ids = sets.keys.toSeq.sorted
    val wantCount = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size.toLong if inter > 0
      if inter * 1000000L / math.min(a.size, b.size) >= 500000L
    } yield 1).size
    assert(got.length == wantCount, s"got ${got.length}, want $wantCount")
    // containment dominates jaccard (min ≤ union): the reason the
    // asymmetric score catches embedded docs the symmetric one dilutes
    got.foreach { case (d1, d2, inter, ppm) =>
      val u = sets(d1).size + sets(d2).size - inter
      assert(ppm >= inter * 1000000L / u,
        s"($d1,$d2) containment below jaccard — impossible")
    }
  }

  test("audienceOverlap == literal distinct-set intersection per type pair") {
    import graft.events.EventOps
    val got = EventOps.audienceOverlap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val sets = spark.read.parquet(s"$sf001/events.parquet")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, vs) => (t, vs.map(_._2).toSet) }
    val types = sets.keys.toSeq.sorted
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
      t1 = types(i); t2 = types(j)
      inter = (sets(t1) & sets(t2)).size.toLong if inter > 0
    } yield (t1, t2) -> ((sets(t1).size.toLong, sets(t2).size.toLong, inter,
      inter * 1000000L / (sets(t1).size + sets(t2).size - inter)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
