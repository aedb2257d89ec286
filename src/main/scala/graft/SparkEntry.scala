package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pc.PcQueries
import graft.text.{Sketches, TextOps}
import graft.sim.{Ivf, Pq, SimOps}
import graft.mm.MultimodalOps
import graft.events.EventOps
import graft.rel.RelQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator from SURVEY.md §2 (or the
  * training-data extension surface), and has a matching DuckDB oracle in
  * `oracleSql` unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * S_RECT: the reference's headline half-open rectangle range query over
    * the synthesized point cloud. */
  def entry(spark: SparkSession): DataFrame =
    PcQueries.rect(PcQueries.sRect)(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference benchmark surface (SURVEY.md §2.2/2.3/2.6, BASELINE.md)
    "pc_count" -> (PcQueries.pcCount(_, _)),
    "pc_bounds" -> (PcQueries.pcBounds(_, _)),
    "pc_srect" -> (PcQueries.rect(PcQueries.sRect)(_, _)),
    "pc_mrect" -> (PcQueries.rect(PcQueries.mRect)(_, _)),
    "pc_scirc" -> (PcQueries.circle(
      PcQueries.sCircle._1, PcQueries.sCircle._2, PcQueries.sCircle._3)(_, _)),
    "pc_mcirc" -> (PcQueries.circle(
      PcQueries.mCircle._1, PcQueries.mCircle._2, PcQueries.mCircle._3)(_, _)),
    "pc_sample_s" -> (PcQueries.sample(0.002)(_, _)),
    "pc_sample_m" -> (PcQueries.sample(0.01)(_, _)),
    "pc_sample_l" -> (PcQueries.sample(0.05)(_, _)),
    "pc_knn_100" -> (PcQueries.knn(100, 100.0)(_, _)),
    "pc_knn_1000" -> (PcQueries.knn(1000, 250.0)(_, _)),
    "pc_viz_cell" -> (PcQueries.viz(_, _)),
    "pc_color_rescale" -> (PcQueries.colorRescale(_, _)),
    // -- data-organization operators as relational queries (SURVEY.md §2.7)
    "pc_grid_cells" -> (PcQueries.gridCells(_, _)),
    "pc_quadtree_assign" -> (PcQueries.quadtreeAssign(_, _)),
    "pc_srect_grid" -> (PcQueries.rectOnGrid(PcQueries.sRect)(_, _)),
    "pc_srect_zorder" -> (PcQueries.rectOnZorder(PcQueries.sRect)(_, _)),
    "pc_dist_join" -> (PcQueries.distJoin(PcQueries.sRect, 5.0)(_, _)),
    "pc_hausdorff" -> (PcQueries.hausdorff(_, _)),
    "pc_register" -> (PcQueries.register(_, _)),
    "pc_scirc_rule" -> (PcQueries.circleOnGridNaive(
      PcQueries.sCircle._1, PcQueries.sCircle._2, PcQueries.sCircle._3)(_, _)),
    "pc_sample_quad" -> (PcQueries.sampleOnQuadtree(0.01)(_, _)),
    "pc_knn_grid" -> (PcQueries.knnOnGrid(1000, 250.0)(_, _)),
    // -- text analysis (training-data pipeline extension surface)
    "doc_stats" -> (TextOps.docStats(_, _)),
    "doc_quality" -> (TextOps.docQuality(_, _)),
    "doc_gopher" -> (TextOps.docGopher(_, _)),
    "doc_langid" -> (TextOps.docLangId(_, _)),
    "doc_fingerprint" -> (TextOps.docFingerprint(_, _)),
    "doc_top_terms" -> (TextOps.topTerms(25)(_, _)),
    "doc_top_terms_salted" -> (TextOps.topTermsSalted(25)(_, _)),
    "doc_tfidf_top" -> (TextOps.docTfidfTop(50)(_, _)),
    "doc_len_hist" -> (TextOps.docLenHistogram(_, _)),
    "doc_vocab" -> (TextOps.vocab(_, _)),
    "doc_sample_strat" -> (TextOps.stratifiedSample(_, _)),
    "doc_repetition" -> (TextOps.docRepetition(_, _)),
    "doc_mix" -> (TextOps.docMix(_, _)),
    "doc_pack" -> (TextOps.docPack(2048L)(_, _)),
    "doc_pack_stats" -> (TextOps.docPackStats(2048L)(_, _)),
    "doc_chunk" -> (TextOps.docChunk(32)(_, _)),
    "doc_train_order" -> (TextOps.docTrainOrder()(_, _)),
    "doc_bigram_top" -> (TextOps.docBigramTop(25)(_, _)),
    "doc_contamination" -> (TextOps.contamination(10L)(_, _)),
    "doc_dup_clusters" -> (TextOps.dupClusters(TextOps.DupClusterTau)(_, _)),
    "doc_dedup_keep" -> (TextOps.dedupKeepOne(TextOps.DupClusterTau)(_, _)),
    // -- deduplication
    "doc_scrub" -> (TextOps.docScrub(_, _)),
    "doc_exact_dedup" -> (TextOps.exactDedup(_, _)),
    "doc_ngram_pairs" -> (TextOps.ngramJaccardPairs(0.8)(_, _)),
    "doc_minhash_sig" -> (Sketches.minhashSignatures(_, _)),
    "doc_minhash_pairs" -> (Sketches.minhashLshPairs(_, _)),
    "doc_simhash" -> (Sketches.simhash(_, _)),
    "doc_simhash_pairs" -> (Sketches.simhashPairs(3)(_, _)),
    // -- similarity search over embeddings
    "emb_topk" -> (SimOps.topK(0L, 20)(_, _)),
    "emb_topk_multi" -> (SimOps.topKMulti(10, 5)(_, _)),
    "emb_top_pairs_label" -> (SimOps.topPairsWithinLabel(20)(_, _)),
    "emb_lsh_buckets" -> (SimOps.lshBuckets(_, _)),
    "emb_lsh_topk" -> (SimOps.lshTopK(0L, 10)(_, _)),
    "emb_lsh_topk_part" -> (SimOps.lshTopKPartitioned(0L, 10)(_, _)),
    "emb_lsh_topk_mp" -> (SimOps.lshTopKMultiProbe(0L, 10)(_, _)),
    "emb_ivf_assign" -> (Ivf.assign(_, _)),
    "emb_ivf_topk" -> (Ivf.topK(0L, 10, 2)(_, _)),
    "emb_ivf_topk_part" -> (Ivf.topKPartitioned(0L, 10, 2)(_, _)),
    "emb_pq_codes" -> (Pq.codes(_, _)),
    "emb_pq_topk" -> (Pq.topK(0L, 10)(_, _)),
    "emb_pq_rerank" -> (Pq.rerank(0L, 50, 10)(_, _)),
    "emb_ivfpq_topk" -> (Pq.ivfPqTopK(0L, 10, 2, 50)(_, _)),
    "dedup_crosscheck" -> (Sketches.crossCheckPairs(_, _)),
    // -- multimodal binary columns
    "mm_meta" -> (MultimodalOps.mmMeta(_, _)),
    "mm_chunk_hash" -> (MultimodalOps.mmChunkHashes(_, _)),
    "mm_features" -> (MultimodalOps.mmFeatures(_, _)),
    "mm_frame_sample" -> (MultimodalOps.mmFrameSample(4L)(_, _)),
    "mm_resize" -> (MultimodalOps.mmResize(320, 240)(_, _)),
    // -- event-log / windowed operators
    "events_hourly" -> (EventOps.hourlyRollup(_, _)),
    "events_sessionize" -> (EventOps.sessionize(_, _)),
    "events_json_rollup" -> (EventOps.jsonRollup(_, _)),
    "events_top_by_type" -> (EventOps.topByType(_, _)),
    "events_asof_join" -> (EventOps.asOfJoin(_, _)),
    "events_funnel" -> (EventOps.funnel(_, _)),
    "events_retention" -> (EventOps.retention(_, _)),
    "events_moving_sum" -> (EventOps.movingSum(_, _)),
    // -- relational star-join surface (joins/keyed aggs; broadcast dims)
    "rel_pricing_summary" -> (RelQueries.pricingSummary(_, _)),
    "rel_rollup" -> (RelQueries.rollupSummary(_, _)),
    // sketch aggregates: no SQL oracle (engine-specific sketches) =>
    // driver records the weaker rows-only check, spec bounds the error
    "events_approx" -> (EventOps.approxStats(_, _)),
    "events_hll" -> (EventOps.hllUsers(_, _)),
    "events_hll_agg" -> (EventOps.hllUsersAgg(_, _)),
    "events_quantiles" -> (EventOps.quantiles(_, _)),
    "events_outliers" -> (EventOps.outliers(_, _)),
    "rel_top_orders" -> (RelQueries.topOrders(_, _)),
    "rel_nation_revenue" -> (RelQueries.nationRevenue(_, _)),
    "rel_small_qty_rev" -> (RelQueries.smallQtyRevenue("Brand#4")(_, _)),
    "rel_order_rev_bucket" -> (RelQueries.orderRevenueBucket(_, _)),
    "rel_large_orders" -> (RelQueries.largeOrders(300L)(_, _)),
    "rel_pricing_lake" -> (RelQueries.pricingSummaryLake(_, _)),
    "rel_never_urgent" -> (RelQueries.neverUrgent(_, _)),
    "rel_priority_share" -> (RelQueries.priorityShare(_, _)),
    "rel_returned_priority" -> (RelQueries.returnedByPriority(_, _)),
    "rel_nation_pairs" -> (RelQueries.nationPairs(_, _)),
    "rel_promo_share" -> (RelQueries.promoShare(_, _)),
    "rel_top_returned" -> (RelQueries.topReturned(_, _)),
    "rel_top_supplier" -> (RelQueries.topSupplier(_, _)),
    "rel_order_count_hist" -> (RelQueries.orderCountHist(_, _)),
    "rel_part_bands" -> (RelQueries.partBands(_, _)),
    "rel_cheapest_supplier" -> (RelQueries.cheapestSupplier("Brand#5")(_, _)),
    "events_cube" -> (EventOps.cubeByHour(_, _)),
    "events_pivot" -> (EventOps.pivotByType(_, _)),
    "events_unpivot" -> (EventOps.unpivotByType(_, _)),
    "events_deciles" -> (EventOps.valueDeciles(_, _)),
    "events_dense_hourly" -> (EventOps.denseHourly(_, _)),
    "events_feed_reconcile" -> (EventOps.purchaseVsErrorHourly(_, _)),
    "doc_vocab_overlap" -> (TextOps.vocabOverlap("en", "de")(_, _)),
    "events_click_no_buy" -> (EventOps.clickNoBuyDays(_, _)),
    "doc_top_per_source" -> (TextOps.docTopPerSource(3)(_, _)),
    "doc_winnow" -> (TextOps.docWinnow(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "pc_count" -> PcQueries.pcCountSql,
    "pc_bounds" -> PcQueries.pcBoundsSql,
    "pc_srect" -> PcQueries.rectSql(PcQueries.sRect),
    "pc_mrect" -> PcQueries.rectSql(PcQueries.mRect),
    "pc_scirc" -> PcQueries.circleSql(
      PcQueries.sCircle._1, PcQueries.sCircle._2, PcQueries.sCircle._3),
    "pc_mcirc" -> PcQueries.circleSql(
      PcQueries.mCircle._1, PcQueries.mCircle._2, PcQueries.mCircle._3),
    "pc_sample_s" -> PcQueries.sampleSql(0.002),
    "pc_sample_m" -> PcQueries.sampleSql(0.01),
    "pc_sample_l" -> PcQueries.sampleSql(0.05),
    "pc_knn_100" -> PcQueries.knnSql(100, 100.0),
    "pc_knn_1000" -> PcQueries.knnSql(1000, 250.0),
    "pc_viz_cell" -> PcQueries.vizSql,
    "pc_color_rescale" -> PcQueries.colorRescaleSql,
    "pc_grid_cells" -> PcQueries.gridCellsSql,
    "pc_quadtree_assign" -> PcQueries.quadtreeAssignSql,
    // layout-backed: layouts are result-invariant, so the oracle is the
    // same SQL as the flat-path query
    "pc_srect_grid" -> PcQueries.rectSql(PcQueries.sRect),
    "pc_srect_zorder" -> PcQueries.rectSql(PcQueries.sRect),
    "pc_dist_join" -> PcQueries.distJoinSql(PcQueries.sRect, 5.0),
    "pc_hausdorff" -> PcQueries.hausdorffSql,
    "pc_register" -> PcQueries.registerSql,
    "pc_scirc_rule" -> PcQueries.circleSql( // rule only changes the plan
      PcQueries.sCircle._1, PcQueries.sCircle._2, PcQueries.sCircle._3),
    "pc_sample_quad" -> PcQueries.sampleSql(0.01),
    "pc_knn_grid" -> PcQueries.knnSql(1000, 250.0),
    "doc_stats" -> TextOps.docStatsSql,
    "doc_quality" -> TextOps.docQualitySql,
    "doc_gopher" -> TextOps.docGopherSql,
    "doc_langid" -> TextOps.docLangIdSql,
    "doc_fingerprint" -> TextOps.docFingerprintSql,
    "doc_top_terms" -> TextOps.topTermsSql(25),
    "doc_top_terms_salted" -> TextOps.topTermsSql(25), // salted == plain, by construction
    "doc_tfidf_top" -> TextOps.docTfidfTopSql(50),
    "doc_len_hist" -> TextOps.docLenHistogramSql,
    "doc_vocab" -> TextOps.vocabSql,
    "doc_sample_strat" -> TextOps.stratifiedSampleSql,
    "doc_repetition" -> TextOps.docRepetitionSql,
    "doc_mix" -> TextOps.docMixSql,
    "doc_pack" -> TextOps.docPackSql(2048L),
    "doc_pack_stats" -> TextOps.docPackStatsSql(2048L),
    "doc_chunk" -> TextOps.docChunkSql(32),
    "doc_train_order" -> TextOps.docTrainOrderSql(),
    "doc_bigram_top" -> TextOps.docBigramTopSql(25),
    "doc_contamination" -> TextOps.contaminationSql(10L),
    "doc_dup_clusters" -> TextOps.dupClustersSql(TextOps.DupClusterTau),
    "doc_dedup_keep" -> TextOps.dedupKeepOneSql(TextOps.DupClusterTau),
    "doc_scrub" -> TextOps.docScrubSql,
    "doc_exact_dedup" -> TextOps.exactDedupSql,
    "doc_ngram_pairs" -> TextOps.ngramJaccardPairsSql(0.8),
    "doc_minhash_sig" -> Sketches.minhashSignaturesSql,
    "doc_minhash_pairs" -> Sketches.minhashLshPairsSql,
    "doc_simhash" -> Sketches.simhashSql,
    "doc_simhash_pairs" -> Sketches.simhashPairsSql(3),
    "emb_topk" -> SimOps.topKSql(0L, 20),
    "emb_topk_multi" -> SimOps.topKMultiSql(10, 5),
    "emb_top_pairs_label" -> SimOps.topPairsWithinLabelSql(20),
    "emb_lsh_buckets" -> SimOps.lshBucketsSql,
    "emb_lsh_topk" -> SimOps.lshTopKSql(0L, 10),
    "emb_lsh_topk_part" -> SimOps.lshTopKSql(0L, 10), // layout is result-invariant
    "emb_lsh_topk_mp" -> SimOps.lshTopKMultiProbeSql(0L, 10),
    "emb_ivf_assign" -> Ivf.assignSql,
    "emb_ivf_topk" -> Ivf.topKSql(0L, 10, 2),
    "emb_ivf_topk_part" -> Ivf.topKSql(0L, 10, 2), // layout is result-invariant
    "emb_pq_codes" -> Pq.codesSql,
    "emb_pq_topk" -> Pq.topKSql(0L, 10),
    "emb_pq_rerank" -> Pq.rerankSql(0L, 50, 10),
    "emb_ivfpq_topk" -> Pq.ivfPqTopKSql(0L, 10, 2, 50),
    "dedup_crosscheck" -> Sketches.crossCheckPairsSql,
    "mm_meta" -> MultimodalOps.mmMetaSql,
    "mm_chunk_hash" -> MultimodalOps.mmChunkHashesSql,
    "mm_features" -> MultimodalOps.mmFeaturesSql,
    "mm_frame_sample" -> MultimodalOps.mmFrameSampleSql(4L),
    "mm_resize" -> MultimodalOps.mmResizeSql(320, 240),
    "events_hourly" -> EventOps.hourlyRollupSql,
    "events_sessionize" -> EventOps.sessionizeSql,
    "events_json_rollup" -> EventOps.jsonRollupSql,
    "events_top_by_type" -> EventOps.topByTypeSql,
    "events_hll" -> EventOps.hllUsersSql,
    "events_hll_agg" -> EventOps.hllUsersSql, // same math, native aggregate
    "events_quantiles" -> EventOps.quantilesSql,
    "events_outliers" -> EventOps.outliersSql,
    "events_asof_join" -> EventOps.asOfJoinSql,
    "events_funnel" -> EventOps.funnelSql,
    "events_retention" -> EventOps.retentionSql,
    "events_moving_sum" -> EventOps.movingSumSql,
    "rel_pricing_summary" -> RelQueries.pricingSummarySql,
    "rel_rollup" -> RelQueries.rollupSummarySql,
    "rel_top_orders" -> RelQueries.topOrdersSql,
    "rel_nation_revenue" -> RelQueries.nationRevenueSql,
    "rel_small_qty_rev" -> RelQueries.smallQtyRevenueSql("Brand#4"),
    // layout is result-invariant: oracle is the flat-parquet SQL
    "rel_order_rev_bucket" -> RelQueries.orderRevenueBucketSql,
    "rel_large_orders" -> RelQueries.largeOrdersSql(300L),
    // the lake is a layout, not a semantics change: flat SQL is the oracle
    "rel_pricing_lake" -> RelQueries.pricingSummarySql,
    "rel_never_urgent" -> RelQueries.neverUrgentSql,
    "rel_priority_share" -> RelQueries.prioritySharesSql,
    "rel_returned_priority" -> RelQueries.returnedByPrioritySql,
    "rel_nation_pairs" -> RelQueries.nationPairsSql,
    "rel_promo_share" -> RelQueries.promoShareSql,
    "rel_top_returned" -> RelQueries.topReturnedSql,
    "rel_top_supplier" -> RelQueries.topSupplierSql,
    "rel_order_count_hist" -> RelQueries.orderCountHistSql,
    "rel_part_bands" -> RelQueries.partBandsSql,
    "rel_cheapest_supplier" -> RelQueries.cheapestSupplierSql("Brand#5"),
    "events_cube" -> EventOps.cubeByHourSql,
    "events_pivot" -> EventOps.pivotByTypeSql,
    "events_unpivot" -> EventOps.unpivotByTypeSql,
    "events_deciles" -> EventOps.valueDecilesSql,
    "events_dense_hourly" -> EventOps.denseHourlySql,
    "events_feed_reconcile" -> EventOps.purchaseVsErrorHourlySql,
    "doc_vocab_overlap" -> TextOps.vocabOverlapSql("en", "de"),
    "events_click_no_buy" -> EventOps.clickNoBuyDaysSql,
    "doc_top_per_source" -> TextOps.docTopPerSourceSql(3),
    "doc_winnow" -> TextOps.docWinnowSql,
  )
}
