package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...},"index_build":...}.
  *
  * A warm-up pass (untimed) absorbs JVM/codegen/FileSystem-init cost so
  * the numbers measure the queries, not session startup. The one-time
  * shared-artifact builds (shingle index, ANN/IVF/grid/quadtree layouts,
  * IVF codebook) run BEFORE the timed loop and report under
  * `index_build` — they are index-build costs a production deployment
  * amortizes across all queries, and charging them to whichever query
  * happens to run first made per-query numbers order-dependent.
  *
  * SPARK_GRAFT_BENCH_FILTER (comma-separated name prefixes) restricts
  * the run for isolated experiments; unset = everything.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val spark = LocalSession("32")
    // Warm-up: touch every input table once (schema + footer + codegen).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    Seq("lineitem", "documents", "embeddings", "events",
      "orders", "customer", "supplier", "part", "nation", "region").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.forall(_.exists(n.startsWith)) }
    val selected = queries.map(_._1)

    // one-time index/layout builds, isolated and individually timed —
    // but only those some selected query actually consumes (a filtered
    // experiment must not pay for unrelated builds)
    val indexDefs: Seq[(String, String => Boolean, () => Unit)] = Seq(
      ("shingle_index", n => n.startsWith("doc_") || n.startsWith("dedup_"),
        () => graft.text.TextOps.prebuildShingleIndex(spark, sfDir)),
      ("winnow_index", _.startsWith("doc_winnow"),
        () => graft.text.TextOps.prebuildWinnowIndex(spark, sfDir)),
      ("pair_index", n => n.startsWith("doc_dup_clusters") || n.startsWith("doc_dedup_keep"),
        () => graft.text.TextOps.prebuildPairIndex(graft.text.TextOps.DupClusterTau)(spark, sfDir)),
      ("label_index", _.startsWith("doc_dedup_keep"),
        () => graft.text.TextOps.prebuildLabelIndex(graft.text.TextOps.DupClusterTau)(spark, sfDir)),
      ("ivf_codebook", _.startsWith("emb_ivf"),
        () => { graft.sim.Ivf.trainCached(spark, sfDir); () }),
      ("pq_codebooks", n => n.startsWith("emb_pq") || n.startsWith("emb_ivfpq"),
        () => graft.sim.Pq.prebuildCodebooks(spark, sfDir)),
      ("pq_codes_layout", n => n.startsWith("emb_pq_topk") ||
        n.startsWith("emb_pq_rerank") || n.startsWith("emb_ivfpq"),
        () => graft.sim.Pq.prebuildCodesLayout(spark, sfDir)),
      // the partitioned-layout build feeds only the `_part` probe arm
      ("ivf_layout", n => n.startsWith("emb_ivf") && !n.startsWith("emb_ivfpq"),
        () => { graft.sim.Ivf.layoutPath(spark, sfDir); () }),
      ("ann_layout", _.startsWith("emb_lsh"),
        () => graft.sim.SimOps.prebuildAnnLayout(spark, sfDir)),
      ("pc_layouts", _.startsWith("pc_"),
        () => graft.pc.PcQueries.prebuildLayouts(spark, sfDir)),
      ("bucket_layout", _.startsWith("rel_order_rev_bucket"),
        () => graft.rel.RelQueries.prebuildBucketedTables(spark, sfDir)),
      ("lake_ingest", _.startsWith("rel_pricing_lake"),
        () => graft.rel.RelQueries.prebuildLakeTable(spark, sfDir)),
      ("mv_build", _.startsWith("rel_pricing_mv"),
        () => graft.rel.RelQueries.prebuildMv(spark, sfDir)))
    val indexBuilds: Seq[(String, Double)] = indexDefs
      .filter { case (_, relevant, _) => selected.exists(relevant) }
      .map { case (name, _, build) =>
        name -> (try timed(build()) catch {
          case e: Throwable =>
            System.err.println(s"bench: index $name FAILED: ${e.getMessage}")
            -1.0
        })
      }

    // min of 3 runs per query: steady-state (plans cached, JIT warm, all
    // shared indexes built); min discards shared-machine noise spikes
    val results = queries.map { case (name, fn) =>
      var failed = false
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"bench: $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // -1 sentinel: a throwing query must not report as a fast success
      name -> (if (failed) -1.0 else times.min)
    }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed index builds belong in `failed` too: a gate watching
    // failed==[] must notice the isolation silently degrading (the first
    // consumer query would re-run the build inside its timed loop)
    val failedNames = (results.collect { case (k, v) if v < 0 => "\"" + k + "\"" } ++
      indexBuilds.collect { case (k, v) if v < 0 => "\"index:" + k + "\"" })
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val indexTotal = indexBuilds.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results)},"index_build":${jsonMap(indexBuilds)},"index_build_total":$indexTotal,"failed":$failedNames,"sf":"$sfDir"}"""
    println(line)
    // the stdout line gets tail-truncated in round artifacts (r4 lost
    // most per-query timings) — persist the full JSON to a file too so
    // the numbers are always recoverable and committable
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")), line)
    catch { case e: Throwable =>
      System.err.println(s"bench: could not persist bench_last.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
