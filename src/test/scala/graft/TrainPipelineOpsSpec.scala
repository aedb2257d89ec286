package graft

import org.apache.spark.sql.functions._

import graft.text.TextOps

/** The round-4 training-pipeline additions: context-length chunking,
  * deterministic training order, adjacent-pair counting. Value
  * correctness is oracle-gated (doc_chunk / doc_train_order /
  * doc_bigram_top); these specs pin the scale-shape claims and the
  * invariants the oracle can't see. */
class TrainPipelineOpsSpec extends SparkSpec {

  test("docChunk is a pure map-side explode: zero shuffles") {
    assert(countShuffles(TextOps.docChunk(32)(spark, sf0001)
      .limit(1000000)) == 0 ||
      // orderBy for the oracle adds a range exchange; the operator core
      // (everything under the sort) must be exchange-free
      countShuffles(TextOps.docChunk(32)(spark, sf0001)) == 1)
  }

  test("docChunk tiles every document exactly: sum of chunk tokens = n_tokens") {
    val chunks = TextOps.docChunk(32)(spark, sf0001)
      .groupBy("doc_id")
      .agg(sum("n_chunk_tokens").as("sum_ct"), count(lit(1)).as("n_chunks"),
        max("n_chunk_tokens").as("max_ct"))
    val stats = TextOps.docStats(spark, sf0001).select("doc_id", "n_tokens")
    val joined = chunks.join(stats, "doc_id")
    assert(joined.filter(col("sum_ct") =!= col("n_tokens")).count() == 0,
      "chunk tokens must tile the document")
    assert(joined.filter(col("max_ct") > 32).count() == 0, "chunk overflows width")
    // every chunk except possibly the last is full-width
    val nonFull = TextOps.docChunk(32)(spark, sf0001)
      .withColumn("is_last",
        col("chunk_id") === max("chunk_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(!col("is_last") && col("n_chunk_tokens") =!= 32)
    assert(nonFull.count() == 0, "interior chunks must be full")
  }

  test("docTrainOrder is a permutation: per-shard positions are 0..n-1, total covers corpus") {
    val order = TextOps.docTrainOrder()(spark, sf0001)
    val n = order.count()
    assert(n == spark.read.parquet(s"$sf0001/documents.parquet").count())
    // per shard: max pos = count-1 and positions are distinct => 0..n-1
    val byShard = order.groupBy("shard")
      .agg(count(lit(1)).as("n"), countDistinct("pos").as("nd"), max("pos").as("mx"))
    assert(byShard.filter(col("nd") =!= col("n") || col("mx") =!= col("n") - 1)
      .count() == 0, "per-shard positions must be a dense 0-based permutation")
  }

  test("docTrainOrder is deterministic and seed-sensitive") {
    val a = TextOps.docTrainOrder()(spark, sf0001).collect().toSeq
    val b = TextOps.docTrainOrder()(spark, sf0001).collect().toSeq
    assert(a == b, "same seed must reproduce the same order")
    val c = TextOps.docTrainOrder(seed = 8)(spark, sf0001)
      .collect().toSeq
    assert(a != c, "a different seed must produce a different order")
  }

  test("docTrainOrder spreads shards evenly (uniform hash)") {
    val sizes = TextOps.docTrainOrder()(spark, sf0001)
      .groupBy("shard").count().collect().map(_.getLong(1))
    val n = sizes.sum.toDouble
    assert(sizes.length == 16)
    // loose balance bound: no shard above 3x the mean (md5 is uniform;
    // this trips only on a broken hash->shard mapping)
    assert(sizes.max <= 3 * n / 16, s"shard skew: ${sizes.mkString(",")}")
  }

  test("docBigramTop counts adjacent pairs exactly (tiny hand-checked corpus)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bigram").toString
    Seq(
      (1L, "a b a b c", "en", "s", 9L),
      (2L, "a b", "en", "s", 3L),
      (3L, "c", "en", "s", 1L),
      (4L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextOps.docBigramTop(10)(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // "a b": doc1 twice + doc2 once; "b a"/"b c": once; "" contributes none
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("docBigramTop plan: one aggregation shuffle, top-k is TakeOrdered") {
    val df = TextOps.docBigramTop(25)(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
    assert(countShuffles(df) <= 1, "bigram counting is one exchange")
  }

  test("docSplitSafe: no near-dup cluster straddles train/valid/test") {
    import org.apache.spark.sql.functions._
    val tau = graft.text.TextOps.DupClusterTau
    // recompute the per-doc split assignment the report aggregates, and
    // join it against the converged cluster labels: every multi-doc
    // cluster must land in exactly ONE split
    val labels = graft.text.TextOps.dupClusters(tau)(spark, sf001)
      .select(col("doc_id"), col("cluster"), col("cluster_size"))
    val bucket = conv(substring(md5(col("cluster").cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    val assigned = labels.filter(col("cluster_size") > 1)
      .select(col("cluster"),
        when(bucket < 80, "train").when(bucket < 90, "valid")
          .otherwise("test").as("split"))
    val straddlers = assigned.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddlers.count() == 0, "a near-dup cluster straddles splits")
    // the report itself: totals match the plain per-doc split's corpus
    // totals (re-keying moves docs between splits, never loses them)
    val safe = graft.text.TextOps.docSplitSafe(tau)(spark, sf001)
    val plain = graft.text.TextOps.docSplit(spark, sf001)
    def totals(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum("n_docs"), sum("n_chars_total")).head().toSeq
    assert(totals(safe) == totals(plain))
    // and it differs from the plain split somewhere (the fixture HAS
    // near-dup clusters, so re-keying must move at least one doc)
    assert(safe.collect().toSeq != plain.collect().toSeq,
      "cluster re-keying changed nothing — fixture has no straddling dups?")
  }

  test("docLmScore matches a driver-side bigram LM recomputation (sf0.001)") {
    val texts = TextOps.docs(spark, sf0001).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val pairs = texts.flatMap { case (id, ws) =>
      ws.sliding(2).collect { case Seq(a, b) => (id, a, a + " " + b) }
    }
    val bn = pairs.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val un = pairs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val expected = pairs.groupBy(_._1).map { case (id, ps) =>
      val ppms = ps.map(p => bn(p._3) * 1000000L / un(p._2))
      id -> (ps.size.toLong, ppms.sum / ps.size)
    }
    val got = TextOps.docLmScore(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("docLmScore: scores bounded by construction, single-token docs excluded") {
    val scored = TextOps.docLmScore(spark, sf001).cache()
    assert(scored.filter(col("lm_ppm") <= 0 || col("lm_ppm") > 1000000L).count() == 0,
      "conditional ppm must land in (0, 1e6]")
    val eligible = TextOps.docs(spark, sf001)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(scored.count() == eligible,
      "every document with >=2 tokens gets a score, shorter ones none")
    scored.unpersist()
  }
}
