package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, GlobalLimit, LocalLimit, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Library-wide broadcast-hint audit (r6 verdict item 5): walks EVERY
  * `SparkEntry.queries` plan and asserts each `broadcast()` hint is
  * bounded — structurally, or by an explicitly justified allowlist
  * entry. The r6 audit of all hint sites lived in prose (NOTES_r06);
  * this spec is that audit as a regression gate, so the
  * `rel_large_orders` class (a hint over an SF-proportional relation
  * that cannot degrade and OOMs at 100 TB) can never ship again in ANY
  * query family.
  *
  * Structurally bounded hint subtrees (no allowlist entry needed):
  *  - immediate child is an UNGROUPED aggregate → 1 row;
  *  - a LIMIT anywhere in the subtree → ≤ k rows;
  *  - every file scan in the subtree is a fixed-cardinality dimension
  *    (nation = 25, region = 5) or there is no file scan at all
  *    (literal/local relations).
  *
  * Everything else must appear in `allowlist` with a reason — the entry
  * is a REVIEWED claim that the relation is bounded by a mechanism the
  * plan shape cannot show (a literal key-range filter, a df-cap
  * frequency threshold, a trained-model cardinality). The assertion is
  * exact-count per query, so adding a new hint anywhere fails until it
  * is either structurally bounded or reviewed here.
  */
class HintAuditSpec extends SparkSpec {

  private val boundedTables = Seq("nation", "region")

  private def boundedShape(h: ResolvedHint): Boolean = {
    val oneRowAgg = h.child match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case _ => false
    }
    val limited = h.child.collectFirst {
      case _: GlobalLimit => (); case _: LocalLimit => ()
    }.isDefined
    oneRowAgg || limited
  }

  /** File-backed scans in a subtree: (path-or-table, isBoundedDim). */
  private def scans(p: LogicalPlan): Seq[(String, Boolean)] = p.collect {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map { rp =>
          val s = rp.toString
          s -> boundedTables.exists(t => s.endsWith(s"$t.parquet"))
        }
      case _ => Nil
    }
    case v: DataSourceV2Relation => Seq(v.table.name() -> false)
  }.flatten

  /** BROADCAST hints that are NOT structurally bounded and DO scan an
    * unbounded file-backed relation somewhere in their subtree. Only
    * broadcast-strategy hints matter: a `merge` hint on a bucketed fact
    * table FORCES the scale-safe plan (sort-merge without a shuffle) —
    * the opposite of the failure mode this spec pins. */
  private def isBroadcast(h: ResolvedHint): Boolean =
    h.hints.strategy.contains(BROADCAST)

  private def unboundedHints(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case h: ResolvedHint if isBroadcast(h) && !boundedShape(h) =>
        val unbounded = scans(h.child).filterNot(_._2).map(_._1)
        if (unbounded.isEmpty) Nil else Seq(unbounded.mkString("[", ", ", "]"))
      case _ => Nil
    }.flatten

  /** queryName -> (allowed unbounded-hint count, reviewed justification).
    * Populated ONLY after reading the hint site: each reason states the
    * mechanism that bounds the broadcast relation independent of corpus
    * size. */
  private val allowlist: Map[String, (Int, String)] = Map(
    // -- text -----------------------------------------------------------
    "doc_bm25_indexed" -> (2,
      "dfr = groupBy(term) over postings pruned to |query| literal terms " +
        "(≤ |query| rows); stats = the index's 1-row corpus-stats file"),
    "doc_contamination" -> (1,
      "evalSh = shingles of the FIXED eval split (doc_id < evalDocs " +
        "literal) — benchmark-sized, independent of corpus growth"),
    "doc_contamination_bloom" -> (1,
      "same evalSh exact-verify side as doc_contamination"),
    "doc_neardup_lookup" -> (1,
      "q/in_q = ONE query document's distinct shingles — bounded by a " +
        "single document's length, never by the corpus"),
    "doc_pack" -> (1,
      "offsets = per-bucket prefix sums; group key g has literal domain " +
        "≤ 64 buckets"),
    "doc_pack_stats" -> (1, "same 64-bucket offsets relation as doc_pack"),
    "doc_sample_weighted" -> (1,
      "rates = one row per language — bounded categorical (|langs|)"),
    "doc_select_budget" -> (1,
      "offsets = (lang × 64 quantile-bucket) prefix sums — literal domain"),
    "doc_train_order" -> (1,
      "offsets = (shard × bucket) prefix sums, 16 × 64 literal domain"),
    // -- similarity: query-side relations, bounded by the request -------
    "emb_topk" -> (1, "q = 1 row (vec_id = literal point filter on a unique key)"),
    "emb_topk_multi" -> (1, "q = nQueries rows (vec_id < literal on a dense unique key)"),
    "emb_lsh_topk" -> (1, "q = 1 row (vec_id = literal)"),
    "emb_lsh_topk_mp" -> (1, "q = 1 row (vec_id = literal)"),
    "emb_ivf_topk" -> (1, "probes = nprobe rows for one query vector"),
    "emb_ivf2_topk" -> (1, "qe = 1 row (vec_id = literal point filter on a unique key)"),
    "emb_ivf2_delete" -> (1,
      "same 1-row qe broadcast as emb_ivf2_topk (shared topK2Impl); the " +
        "DV anti-join side is deliberately UNHINTED — kill-lists can be " +
        "corpus-sized on a duplicate-heavy corpus, AQE decides"),
    "emb_ivf2_lifecycle" -> (1,
      "same 1-row qe broadcast (vec_id = literal point filter); both " +
        "segment scans and the DV anti-join side are UNHINTED — the " +
        "union is corpus-sized and kill-lists can be too, AQE decides"),
    "emb_ivf2_recall" -> (2,
      "composes emb_topk's 1-row query broadcast and emb_ivf2_topk's " +
        "1-row qe broadcast — both point-filtered on the unique vec_id"),
    "emb_ivf_topk_part" -> (1, "probes = nprobe rows for one query vector"),
    "emb_ivf2_topk_batch" -> (1,
      "leaves = nq × nprobe2 probed-leaf rows — bounded by the query " +
        "batch (the deployment knob), independent of corpus size"),
    "emb_ivf_topk_batch" -> (1, "probes = nq × nprobe rows — batch-bounded"),
    "emb_ivf_recall" -> (2,
      "composes emb_topk_multi's nQueries-row query broadcast and " +
        "emb_ivf_topk_batch's nq × nprobe probes — both request-bounded"),
    "emb_ivfpq_topk" -> (1, "q = 1 row (vec_id = literal)"),
    "emb_ivfsq8_topk" -> (1, "q = 1 row (vec_id = literal)"),
    "emb_pq_rerank" -> (1, "q = 1 row (vec_id = literal)"),
    "emb_sq8_topk" -> (2, "qc and qe = 1 row each (vec_id = literal)"),
    "emb_rproj_topk" -> (2, "qq and qe = 1 row each (vec_id = literal)"),
    // -- events: bounded-categorical / calendar-bounded aggregates ------
    "events_deciles" -> (1, "tiles = |event_types| × 10 decile tiles"),
    "events_heavy_users" -> (2,
      "cands/totals = ≤ |event_types| × 2·denom Misra-Gries counters"),
    "events_outliers" -> (1, "stats = per-event_type moments — bounded categorical"),
    "events_approx" -> (2,
      "mm = per-event_type (min, max, n) — bounded categorical, hinted " +
        "at both the bucketing join and the cumulative-rank join"),
    "events_time_weighted" -> (1,
      "nextFirst = one row per (event_type, day) — grows with calendar " +
        "span, not with event count; MBs at decades of data"))

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: every broadcast hint is bounded or reviewed") {
      val df = fn(spark, sf001)
      val bad = unboundedHints(df.queryExecution.analyzed)
      val (allowed, why) = allowlist.getOrElse(name, (0, ""))
      assert(bad.size <= allowed,
        s"$name: ${bad.size} non-structural broadcast hints over " +
          s"file-backed scans (allowed $allowed${if (why.nonEmpty) s": $why" else ""}) — $bad")
    }
  }
}
