package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., 2023,
  * arXiv:2303.09540): cluster the embeddings with a coarse k-means
  * quantizer, then WITHIN each cluster drop every vector that has a
  * near-duplicate (cosine >= tau) closer to the cluster centroid —
  * keeping, per semantic-duplicate group, the member most central to
  * its cluster. The training-data pipeline uses the surviving set as
  * the deduplicated corpus.
  *
  * Reuses [[Ivf]]'s deterministic integer k-means verbatim (seeded
  * centroids, integer Lloyd steps, argmin assignment with ties to the
  * lowest cell — oracle-exact across engines, see Ivf's scaladoc), so
  * "distance to centroid" is the same exact int64 the oracle computes.
  *
  * Dominance rule (the paper's released algorithm, made deterministic):
  * vector v is DROPPED iff some u in the same cell has
  * round(cos(u,v),6) >= tau and u precedes v in the per-cell total
  * order (u.dist < v.dist, ties to the smaller vec_id). The witness u
  * need NOT itself survive — this is exactly SemDeDup's
  * upper-triangular-similarity test over the centrality-sorted cell,
  * where earlier-dropped items still disqualify later ones. Because
  * cosine similarity is not transitive, a chain a~b, b~c with a!~c can
  * therefore drop BOTH b and c while keeping only a: the dedup rate is
  * the paper's, slightly more aggressive than a kept-witness greedy
  * scan (which would need an inherently sequential per-cell pass; the
  * order-free rule here is what makes the decision one equi-join). The
  * per-cell MINIMUM always survives, so no cell is ever emptied.
  *
  * Scale design: the candidate join is an equi-join on the cell id —
  * vectors only meet within their cell, never across, so the pair work
  * is sum(cell^2), not n^2, and the shuffle co-partitions both sides on
  * `cid`. K GROWS WITH THE CORPUS by default (K = max(2, ceil(n /
  * [[Ivf.TargetCell]])), the same knob the paper turns), so cells stay
  * ~TargetCell-sized and total pair work is ~TargetCell·n — linear in
  * n. The oracle derives the identical K with a scalar subquery in its
  * Lloyd seed CTE, so both engines train the same quantizer at every
  * SF. The dominance rule is evaluated as a LEFT SEMI join (it is an
  * EXISTS — see [[droppedCells]]): each vector's probe stops at its
  * first dominator, so no pair set is ever materialized and no
  * distinct aggregation is needed before the final keep-flag join.
  */
object SemDedup {

  /** Fixture-scaled near-duplicate threshold: the synthetic embeddings
    * are random unit vectors (within-cell cosines top out ~0.5), so a
    * production-grade 0.95+ would never fire; 0.40 exercises the prune
    * path while staying above the within-cell similarity median. */
  val Tau: Double = 0.40

  /** Sentinel for `k`: derive the quantizer size from the corpus
    * (`Ivf.derivedK(n)` = max(2, ceil(n / TargetCell))). */
  val DerivedK: Int = -1

  /** (vec_id, embedding, cid, dist): each vector with its trained cell
    * and integer distance to the cell centroid (the dominance key).
    * `k` is the quantizer size — the SCALE KNOB, and by default it is
    * DERIVED from the corpus (k = max(2, ceil(n / TargetCell))), so
    * per-cell pair work stays bounded as the corpus grows: total
    * candidate work is ~TargetCell · n, linear in n. The oracle replays
    * the identical derivation as a scalar subquery in its Lloyd seed
    * CTE ([[Ivf.derivedKSql]]), so both engines train the same K at
    * every SF. */
  def assignment(spark: SparkSession, dir: String, k: Int = DerivedK): DataFrame = {
    val kk = if (k == DerivedK) Ivf.derivedKCached(spark, dir) else k
    val centroids = Ivf.trainCachedK(spark, dir, kk)
    val best = Ivf.nearest(centroids)
    Ivf.quantized(spark, dir)
      .select(col("vec_id"), col("embedding"),
        best.getField("cid").as("cid"), best.getField("dist").as("dist"))
  }

  /** The dominance kill-list over an assignment frame `m` with columns
    * (vec_id, embedding, dist, cellCols...) — ONE Scala definition of
    * the rule (the SQL twin is [[dropped2CtesSql]]): vector v is
    * dropped iff some u in the same cell precedes it in the
    * (dist, vec_id) total order with round(cos(u,v),6) >= tau. Shared
    * by the flat dedup ([[semDedup]], cell = cid), the two-level dedup
    * ([[semDedup2]], cell = (c1, scid)), and the lifecycle DV
    * derivation ([[Ivf2.lifecycleSearch]]'s artifact build) — a drift
    * between copies would silently fork the deletion workload from the
    * dedup pipeline that defines it. Returns DISTINCT `v_id` rows. */
  private[sim] def droppedIds(m: DataFrame, tau: Double,
      cellCols: Seq[String]): DataFrame =
    // one row per dropped vector already (semi-join output of a
    // one-row-per-vector frame) — nothing to de-duplicate
    droppedCells(m, tau, cellCols).select(col("v_id"))

  /** [[droppedIds]] WITH the dropped vector's cell columns — the same
    * one-kernel dominance rule, keeping `v`'s cell key in the output
    * (a DV sidecar writer wants exactly (cellCols..., v_id); deriving
    * it here avoids re-joining the corpus-sized assignment frame
    * against the kill-list just to recover cells the join already knew
    * each id in). The rule is an EXISTS — "some in-cell predecessor u
    * dominates v" — so it is evaluated as a LEFT SEMI join: the probe
    * side stops at each row's FIRST dominator instead of materializing
    * every qualifying pair and de-duplicating them. On a
    * duplicate-heavy cell (the 100× lifecycle fixture piles ~100
    * identical vectors per leaf) a dropped vector's dominator is found
    * in O(1) probes, collapsing the leaf's pair work from quadratic
    * toward linear; kept vectors still pay one full leaf scan, which
    * is what the inner join charged EVERY vector. Output rows are
    * unique by construction (one `v` row per vector), so the old
    * pair-set `.distinct()` exchange disappears with the pair set. */
  private[sim] def droppedCells(m: DataFrame, tau: Double,
      cellCols: Seq[String]): DataFrame = {
    val u = m.select((cellCols.map(c => col(c).as(s"u_$c")) :+
      col("vec_id").as("u_id") :+ col("embedding").as("u_emb") :+
      col("dist").as("u_dist")): _*)
    val v = m.select((cellCols.map(col) :+ col("vec_id").as("v_id") :+
      col("embedding").as("v_emb") :+ col("dist").as("v_dist")): _*)
    val sameCell = cellCols.map(c => col(c) === col(s"u_$c")).reduce(_ && _)
    val precedes = col("u_dist") < col("v_dist") ||
      (col("u_dist") === col("v_dist") && col("u_id") < col("v_id"))
    // u_id =!= v_id is implied by `precedes` on a one-row-per-vector
    // frame, but stays EXPLICIT: the SQL twin (dropped2CtesSql) carries
    // `u.vec_id <> v.vec_id`, and if a caller ever passed a frame with
    // a vec_id under two dists, dropping the guard would let a vector
    // self-dominate (cos(v,v)=1 >= tau) where the oracle keeps it
    v.join(u,
        sameCell && col("u_id") =!= col("v_id") && precedes &&
          round(SimOps.dot(col("u_emb"), col("v_emb")), 6) >= tau,
        "left_semi")
      .select((cellCols.map(col) :+ col("v_id")): _*)
  }

  /** (vec_id, cid, dist, keep) for every vector, sorted by vec_id. */
  def semDedup(tau: Double, k: Int = DerivedK)(
      spark: SparkSession, dir: String): DataFrame = {
    val m = assignment(spark, dir, k)
    val dropped = droppedIds(m, tau, Seq("cid"))
    // no hint: `dropped` is corpus-sized on a duplicate-heavy corpus
    m.join(dropped, m("vec_id") === dropped("v_id"), "left")
      .select(col("vec_id"), col("cid"), col("dist"),
        col("v_id").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** [[semDedup]] over the TWO-LEVEL quantizer's leaf cells — the
    * 100-TB arm: the flat derived-K assignment is O(n·K) (measured
    * quadratic at 100×, `BENCH_SCALE_r08.json`), [[Ivf2]]'s is
    * O(n·√K). The dominance rule is unchanged — vectors meet only
    * within their (c1, scid) leaf, ordered by (dist-to-sub-centroid,
    * vec_id) — and leaves stay ~TargetCell-sized by the per-cell K2
    * derivation, so pair work remains ~TargetCell·n. */
  def semDedup2(tau: Double)(spark: SparkSession, dir: String): DataFrame = {
    // index-consumer path: read the materialized leaf-partitioned
    // assignment (one-time ivf2_layout build) instead of re-running
    // both Lloyd chains per query — identical rows by construction;
    // the SAME frame the DV sidecar build feeds to the kernel
    val m = Ivf2.leafFrame(spark, dir)
    val dropped = droppedIds(m, tau, Seq("c1", "scid"))
    m.join(dropped, m("vec_id") === dropped("v_id"), "left")
      .select(col("vec_id"), col("c1"), col("scid"), col("dist"),
        col("v_id").isNull.as("keep"))
      .orderBy("vec_id")
  }

  /** The `m` + `dropped` CTE pair over a two-level assignment relation
    * (default: the full-corpus chain's `hbf`) — the KILL-LIST relation
    * (`dropped(vec_id)`), shared verbatim by [[semDedup2Sql]], the
    * index-deletion oracles ([[Ivf2.deleteStatsSql]],
    * [[Ivf2.topK2DeletedSql]]), and — with `src = "ubf"` — the
    * composed-lifecycle oracle ([[Ivf2.lifecycleSql]], where the
    * assignment is base ∪ frozen-appended delta): the deletion verb's
    * whole premise is that the kill-list IS the dedup pipeline's
    * output, so every oracle must derive it identically. */
  private[sim] def dropped2CtesSql(tau: Double, src: String = "hbf"): String = {
    val dot = s"list_sum(list_transform(range(1,${Ivf.Dim + 1}), " +
      "i -> CAST(u.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))"
    s"""m AS (SELECT b.vec_id, b.c1, b.scid, b.dist, e.embedding
       |  FROM $src b JOIN embeddings e ON b.vec_id = e.vec_id),
       |dropped AS (SELECT DISTINCT v.vec_id
       |  FROM m u JOIN m v ON u.c1 = v.c1 AND u.scid = v.scid AND u.vec_id <> v.vec_id
       |   AND (u.dist < v.dist OR (u.dist = v.dist AND u.vec_id < v.vec_id))
       |  WHERE round($dot, 6) >= $tau)""".stripMargin.replace("\n", " ")
  }

  def semDedup2Sql(tau: Double): String =
    s"""WITH ${Ivf2.chain2CtesSql},
       |${dropped2CtesSql(tau)}
       |SELECT m.vec_id, m.c1, m.scid, m.dist, (d.vec_id IS NULL) AS keep
       |FROM m LEFT JOIN dropped d ON m.vec_id = d.vec_id
       |ORDER BY m.vec_id""".stripMargin.replace("\n", " ")

  def semDedupSql(tau: Double): String = {
    val dot = s"list_sum(list_transform(range(1,${Ivf.Dim + 1}), " +
      "i -> CAST(u.embedding[i] AS DOUBLE) * CAST(v.embedding[i] AS DOUBLE)))"
    s"""WITH ${Ivf.chainSql(Ivf.LloydSteps, Ivf.derivedKSql)},
       |m AS (SELECT a.vec_id, a.cid, a.dist, e.embedding
       |  FROM afin a JOIN embeddings e ON a.vec_id = e.vec_id),
       |dropped AS (SELECT DISTINCT v.vec_id
       |  FROM m u JOIN m v ON u.cid = v.cid AND u.vec_id <> v.vec_id
       |   AND (u.dist < v.dist OR (u.dist = v.dist AND u.vec_id < v.vec_id))
       |  WHERE round($dot, 6) >= $tau)
       |SELECT m.vec_id, m.cid, m.dist, (d.vec_id IS NULL) AS keep
       |FROM m LEFT JOIN dropped d ON m.vec_id = d.vec_id
       |ORDER BY m.vec_id""".stripMargin.replace("\n", " ")
  }
}
