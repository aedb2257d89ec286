package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-level (hierarchical) derived-K quantizer — the 100-TB answer to
  * the flat codebook's assignment wall. The flat quantizer's cell count
  * DERIVES from the corpus (K = ceil(n/TargetCell)), so exact flat
  * assignment costs O(n·K) = O(n²/TargetCell): measured 102× wall at
  * 100× data (`BENCH_SCALE_r08.json`) — quadratic, as predicted by the
  * [[NearestCell]] scaladoc's "past the ceiling go hierarchical".
  * This module IS that hierarchical composition:
  *
  *  - LEVEL 1: a coarse Lloyd codebook of K1 = max(2, ceil(√K)) cells
  *    (the same deterministic integer k-means as [[Ivf.train]], via
  *    [[Ivf.trainCachedK]]); assignment is the literal-codebook
  *    [[NearestCell]] scan — O(n·K1).
  *  - LEVEL 2: within each coarse cell, an independent sub-quantizer of
  *    K2(c) = max(1, ceil(|cell|/TargetCell)) cells, seeded by the
  *    cell's first members in vec_id order and refined by the same
  *    LloydSteps integer rounds — ALL cells train in parallel as plain
  *    keyed aggregations. Assignment joins each row to its coarse
  *    cell's PACKED sub-codebook (a K1-row relation — never a driver
  *    literal, unlike the flat path's K-sized literal) and runs the
  *    row-codebook argmin [[NearestCellRow]] — O(n·K2).
  *
  * Total assignment work O(n·(K1 + mean K2)) = O(n·√K) — measured ~17×
  * at 100× data where flat is 102×, with leaf cells still
  * ~TargetCell-sized (K1·K2 ≈ K). Determinism end-to-end (integer
  * arithmetic, vec_id-seeded Lloyd at both levels, (dist, id) ties to
  * the lower id) means the DuckDB oracle replays BOTH levels exactly:
  * the coarse chain is [[Ivf.chainSql]] at K1 (a scalar-subquery K),
  * and the per-cell level-2 chain is the same Lloyd recurrence with
  * the coarse cid as an extra partition key. */
object Ivf2 {

  /** Coarse cell count: K1 = max(2, ceil(√(derivedK(n)))). IEEE sqrt is
    * correctly rounded, so ceil(sqrt) of an exact int agrees across
    * engines (perfect squares land exactly). */
  def k1(n: Long): Int =
    math.max(2, math.ceil(math.sqrt(Ivf.derivedK(n).toDouble)).toInt)

  /** The same K1 as a DuckDB scalar subquery (composes [[Ivf.derivedKSql]]'s
    * derivation inline). */
  val k1Sql: String =
    s"(SELECT greatest(2, CAST(ceil(sqrt(greatest(2, (count(*) + " +
      s"${Ivf.TargetCell - 1}) // ${Ivf.TargetCell}))) AS BIGINT)) FROM embeddings)"

  /** (vec_id, qv, c1): the corpus with its coarse cell. Map-only
    * literal-codebook scan at K1 ≈ √K centroids. */
  private def coarseAssigned(spark: SparkSession, dir: String): DataFrame = {
    val coarse = Ivf.trainCachedK(spark, dir, k1(Ivf.corpusN(spark, dir)))
    val best = Ivf.nearest(coarse)
    Ivf.quantized(spark, dir)
      .select(col("vec_id"), col("qv"), best.getField("cid").as("c1"))
  }

  /** Pack each coarse cell's sub-codebook into ONE row (scids ascending,
    * centroid components flattened in scid order) and run the
    * row-codebook argmin. The packed relation has K1 rows — it joins,
    * not broadcasts-by-hint (K1 grows with the corpus; AQE decides). */
  private def assignRow(a: DataFrame, cents: DataFrame): DataFrame = {
    val packed = cents
      .groupBy("c1")
      .agg(sort_array(collect_list(struct(col("scid"), col("cv")))).as("sc"))
      // HOFs over the K1-row packed relation only — never the corpus
      .select(col("c1"),
        expr("transform(sc, x -> x.scid)").as("scids"),
        expr("flatten(transform(sc, x -> x.cv))").as("cvs"))
    a.join(packed, Seq("c1"))
      .withColumn("best",
        call_function("ivf_nearest_cell_row", col("qv"), col("scids"), col("cvs")))
      .select(col("vec_id"), col("qv"), col("c1"),
        col("best").getField("cid").as("scid"),
        col("best").getField("dist").as("dist"))
  }

  /** One distributed level-2 Lloyd update: per-(c1, scid) integer means
    * (truncating division on the positive quantized domain == the
    * oracle's floor division). Cells that attract no vectors drop out,
    * exactly like the GROUP BY. */
  private def lloydStep2(a: DataFrame, cents: DataFrame): DataFrame = {
    val sumCols = (1 to Ivf.Dim).map(j => sum(element_at(col("qv"), j)).as(s"s$j"))
    assignRow(a, cents)
      .groupBy("c1", "scid")
      .agg(count(lit(1)).as("nc"), sumCols: _*)
      .select(col("c1"), col("scid"),
        array((1 to Ivf.Dim).map(j => expr(s"s$j div nc")): _*).as("cv"))
  }

  /** Per-vector two-level assignment: (vec_id, c1, scid, dist), sorted.
    * Oracle twin: [[assign2Sql]]. */
  def assign2(spark: SparkSession, dir: String): DataFrame = {
    val a = coarseAssigned(spark, dir)
    val byCell = Window.partitionBy("c1").orderBy("vec_id")
    val k2 = a.groupBy("c1").agg(count(lit(1)).as("nc"))
      .select(col("c1"),
        expr(s"greatest(1L, (nc + ${Ivf.TargetCell - 1}) div ${Ivf.TargetCell})")
          .as("k2"))
    val seeds = a.withColumn("rn", row_number().over(byCell).cast(LongType))
      .join(k2, Seq("c1"))
      .filter(col("rn") <= col("k2"))
      .select(col("c1"), (col("rn") - 1).as("scid"), col("qv").as("cv"))
    val trained = (1 to Ivf.LloydSteps).foldLeft(seeds)((c, _) => lloydStep2(a, c))
    assignRow(a, trained)
      .select(col("vec_id"), col("c1"), col("scid"), col("dist"))
      .orderBy("vec_id")
  }

  /** The full two-level oracle: [[Ivf.chainSql]]'s coarse chain at K1
    * (CTEs q/c0/d0/a0/.../afin), then the level-2 per-cell Lloyd chain
    * under `h`-prefixed CTEs — the identical recurrence with c1 as an
    * extra partition/grouping key. */
  def assign2Sql: String =
    s"WITH $chain2CtesSql SELECT vec_id, c1, scid, dist FROM hbf ORDER BY vec_id"
      .replace("\n", " ")

  /** The full two-level CTE list (coarse chain + `h`-prefixed level-2
    * chain), ending at `hbf(vec_id, c1, scid, dist)` — shared by
    * [[assign2Sql]] and the two-level cluster-sampling oracle. */
  private[sim] def chain2CtesSql: String = {
    val dim = Ivf.Dim
    val dist = (qv: String, cv: String) =>
      s"CAST(list_sum(list_transform(range(1,${dim + 1}), i -> ($qv[i]-$cv[i])*($qv[i]-$cv[i]))) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= s"${Ivf.chainSql(Ivf.LloydSteps, k1Sql)},\n"
    sb ++= s"""ha AS (SELECT a.vec_id, q.qv, a.cid AS c1 FROM afin a JOIN q USING (vec_id)),
       |hk AS (SELECT c1, greatest(1, (count(*) + ${Ivf.TargetCell - 1}) // ${Ivf.TargetCell}) AS k2 FROM ha GROUP BY 1),
       |hs0 AS (SELECT t.c1, t.rn - 1 AS scid, t.qv AS cv FROM (
       |  SELECT c1, qv, row_number() OVER (PARTITION BY c1 ORDER BY vec_id) AS rn FROM ha) t
       |  JOIN hk ON t.c1 = hk.c1 WHERE t.rn <= hk.k2)""".stripMargin
    (0 until Ivf.LloydSteps).foreach { s =>
      sb ++= s""",
       |hd$s AS (SELECT ha.vec_id, ha.qv, ha.c1, s.scid, ${dist("ha.qv", "s.cv")} AS dist
       |  FROM ha JOIN hs$s s ON ha.c1 = s.c1),
       |hb$s AS (SELECT vec_id, qv, c1, scid FROM (
       |  SELECT vec_id, qv, c1, scid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, scid) AS rn FROM hd$s)
       |  WHERE rn = 1),
       |hs${s + 1} AS (SELECT c1, scid, list(s ORDER BY i) AS cv FROM (
       |  SELECT c1, scid, i, CAST(sum(qv[i]) AS BIGINT) // CAST(count(*) AS BIGINT) AS s
       |  FROM hb$s, range(1,${dim + 1}) AS t(i) GROUP BY c1, scid, i)
       |  GROUP BY c1, scid)""".stripMargin
    }
    sb ++= s""",
       |hdf AS (SELECT ha.vec_id, ha.c1, s.scid, ${dist("ha.qv", "s.cv")} AS dist
       |  FROM ha JOIN hs${Ivf.LloydSteps} s ON ha.c1 = s.c1),
       |hbf AS (SELECT vec_id, c1, scid, dist FROM (
       |  SELECT vec_id, c1, scid, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, scid) AS rn FROM hdf)
       |  WHERE rn = 1)""".stripMargin
    sb.toString.replace("\n", " ")
  }
}
