package graft

import org.apache.spark.sql.functions._
import graft.sim.{Ivf, Pq, SimOps, Sq8}

/** Product quantization: codes, ADC distances, and approximation
  * sanity. Oracle hash-equality is the driver's job; this suite pins the
  * internal contracts the oracle can't see. */
class PqSpec extends SparkSpec {

  private def quantizedRows(n: Int) =
    Ivf.quantized(spark, sf001).orderBy("vec_id").limit(n)
      .select("vec_id", "qv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)

  private def subDist(a: Array[Long], b: Array[Long]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) => val d = x - y; d * d }.sum

  test("codes are valid, deterministic, and match a local argmin replay") {
    val books = Pq.trainCached(spark, sf001)
    assert(books.length == Pq.M)
    books.foreach { b =>
      assert(b.nonEmpty && b.length <= Pq.Ksub)
      b.foreach { case (_, cw) => assert(cw.length == Pq.SubDim) }
    }
    val codes = Pq.codes(spark, sf001).limit(50).collect()
      .map(r => r.getLong(0) -> (0 until Pq.M).map(m => r.getLong(m + 1))).toMap
    val qvs = quantizedRows(50).toMap
    codes.foreach { case (vid, cs) =>
      val qv = qvs(vid)
      cs.zipWithIndex.foreach { case (code, m) =>
        val sv = qv.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        // local argmin with (dist, code) tie-break — must equal the
        // engine's codegen'd least(struct(...)) exactly
        val expect = books(m).map { case (c, cw) => (subDist(sv, cw), c) }.min._2
        assert(code == expect, s"vec $vid subspace $m")
      }
    }
  }

  test("ADC top-k distances equal the assigned-codeword sum exactly") {
    val books = Pq.trainCached(spark, sf001)
    val q0 = quantizedRows(1).head._2
    val top = Pq.topK(0L, 10)(spark, sf001).collect()
    assert(top.length == 10)
    val codes = Pq.codes(spark, sf001).collect()
      .map(r => r.getLong(0) -> (0 until Pq.M).map(m => r.getLong(m + 1))).toMap
    top.foreach { r =>
      val (vid, adc) = (r.getLong(0), r.getLong(1))
      val expect = (0 until Pq.M).map { m =>
        val qs = q0.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        val cw = books(m).find(_._1 == codes(vid)(m)).get._2
        subDist(qs, cw)
      }.sum
      assert(adc == expect, s"vec $vid")
    }
    // ordered ascending with vec_id tie-break
    assert(top.map(r => (r.getLong(1), r.getLong(0))).toSeq ==
      top.map(r => (r.getLong(1), r.getLong(0))).sortBy(identity).toSeq)
  }

  test("ADC ranking approximates the true distance ranking") {
    // the ADC top-10's mean TRUE integer distance must beat the corpus
    // mean by a wide margin — i.e. 1-byte codes still rank usefully
    val qv = Ivf.quantized(spark, sf001)
    val q0 = quantizedRows(1).head._2
    val trueDist = aggregate(
      zip_with(col("qv"), lit(q0), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val all = qv.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), trueDist.as("td")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpusMean = all.values.sum.toDouble / all.size
    val topIds = Pq.topK(0L, 10)(spark, sf001).collect().map(_.getLong(0))
    val topMean = topIds.map(all).sum.toDouble / topIds.length
    assert(topMean < corpusMean * 0.8,
      s"ADC top-10 true-dist mean $topMean vs corpus mean $corpusMean")
  }

  test("unknown query id returns empty, not an error") {
    assert(Pq.topK(-1L, 10)(spark, sf001).collect().isEmpty)
    assert(Pq.rerank(-1L, 50, 10)(spark, sf001).collect().isEmpty)
  }

  test("ivf-pq probe file-prunes the cid-partitioned code index") {
    val df = Pq.ivfPqTopK(0L, 10, 2, 50)(spark, sf001)
    df.collect()
    // the probe filter must reach partition pruning on the code layout,
    // not run as a post-scan filter over all cells
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"), s"no partition pruning:\n$plan")
  }

  test("ivf-pq composition: candidates come only from probed cells") {
    val centroids = Ivf.trainCached(spark, sf001)
    val qv0 = quantizedRows(1).head._2
    val got = Pq.ivfPqTopK(0L, 10, 2, 50)(spark, sf001).collect()
    assert(got.length == 10)
    // every returned vector's IVF cell is one of the 2 probed cells
    val cellOf = Ivf.assign(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeSet = Ivf.probeCells(centroids, qv0, 2).toSet
    got.foreach(r => assert(probeSet(cellOf(r.getLong(0))),
      s"vec ${r.getLong(0)} outside probed cells"))
    // sims are exact (same scorer as brute force)
    val brute = SimOps.topK(0L, 500)(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach(r => assert(r.getDouble(1) == brute(r.getLong(0))))
    assert(Pq.ivfPqTopK(-1L, 10, 2, 50)(spark, sf001).collect().isEmpty)
  }

  test("rerank = exact scores over the ADC shortlist, with useful recall") {
    val shortIds = Pq.topK(0L, 50)(spark, sf001).collect().map(_.getLong(0)).toSet
    val rr = Pq.rerank(0L, 50, 10)(spark, sf001).collect()
    assert(rr.length == 10)
    assert(rr.forall(r => shortIds(r.getLong(0))), "rerank ⊆ shortlist")
    // per-id sims identical to the brute-force scorer (same expression)
    val brute = SimOps.topK(0L, 500)(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rr.foreach(r => assert(r.getDouble(1) == brute(r.getLong(0))))
    // the 50-deep shortlist should recover most of the true top-10
    val trueTop = brute.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
      .map(_._1).toSet
    val hit = rr.map(_.getLong(0)).count(trueTop)
    assert(hit >= 5, s"recall@10 with shortlist 50 was $hit/10")
  }

  test("sq8_encode == chained zip_with spelling: identical codes over the corpus") {
    // the native encode kernel is THE production path (codes relation +
    // partitioned layout); the interpreted HOF chain stays as this
    // spec's reference only
    val (mns, rngs, _) = Sq8.trainCached(spark, sf001)
    def litArr(a: Array[Long]) = a.mkString("array(", "L,", "L)")
    val hof = expr(s"zip_with(zip_with(qv, ${litArr(mns)}, (x, mn) -> x - mn), " +
      s"${litArr(rngs)}, (d, rng) -> least(d * 255L div rng, 255L))")
    val native = call_function("sq8_encode", col("qv"),
      typedLit(mns.toSeq), typedLit(rngs.toSeq))
    val df = Ivf.quantized(spark, sf001).select(hof.as("h"), native.as("n"))
    assert(df.filter(col("h") =!= col("n")).count() == 0)
    // codes actually span the byte domain on the fixture
    assert(df.select(array_max(col("n"))).agg(max(col("array_max(n)"))).head().getLong(0) == 255L)
  }

  test("sq8_ub kernel == the unrolled 64-term bound, and it never excludes a true match") {
    val (mns, rngs, _) = Sq8.trainCached(spark, sf001)
    val q = Ivf.quantized(spark, sf001)
    val qcv = q.filter(col("vec_id") === 0L).select("qv").head()
      .getSeq[Long](0).toArray.map(_ - Sq8.Center)
    val cds = Sq8.codes(spark, sf001)
    val native = call_function("sq8_ub", col("cd"), typedLit(qcv.toSeq),
      typedLit(rngs.toSeq), typedLit(mns.map(_ - Sq8.Center).toSeq))
    val df = cds.select(native.as("n"), Sq8.ubCol(qcv, mns, rngs).as("h"))
    assert(df.filter(col("n") =!= col("h")).count() == 0)
    // soundness: ub >= the exact centered dot for EVERY row (a single
    // false negative would silently drop a range-search result)
    val joined = cds.join(q, "vec_id")
      .select(native.as("ub"),
        call_function("center_dot", col("qv"), typedLit(qcv.toSeq),
          lit(Sq8.Center)).as("csim"))
    assert(joined.filter(col("ub") < col("csim")).count() == 0)
  }
}
