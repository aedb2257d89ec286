package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Product quantization (PQ) — the memory-compression half of the
  * classic IVF-PQ ANN stack ([[Ivf]] is the routing half). The vector
  * space splits into `M` orthogonal subspaces; each subspace trains its
  * own tiny codebook (integer k-means, same determinism contract as
  * [[Ivf]]), and a vector is stored as `M` small codes — here 4 × 2 bits
  * against 64 float32 components, a 256 B → 1 B compression. Search uses
  * asymmetric distance computation (ADC): the query builds an `M × Ksub`
  * lookup table of exact subspace distances once, and every candidate's
  * approximate distance is `M` table lookups — no float math per row.
  *
  * **Determinism contract.** Identical to [[Ivf]]: int64-quantized
  * components, seeds = the `Ksub` smallest vec_ids' subvectors, integer
  * argmin with ties to the lowest code, floor-division Lloyd updates —
  * so codebooks, codes, and integer ADC distances all hash-match the
  * DuckDB oracle, which replays the same chain per subspace in SQL.
  *
  * **Scale design.** Training collects M × Ksub × SubDim longs (driver-
  * trivial); encoding is a map-only projection (literal codewords baked
  * into codegen'd `least(struct(...))` expressions — no join, no
  * shuffle); ADC search is a map-only projection over the codes relation
  * (the LUT is a literal array — effectively a broadcast of M × Ksub
  * longs) followed by TakeOrderedAndProject. At 100 TB the codes
  * relation is ~1/256 the size of the embeddings, so a full ADC scan
  * reads ~400 GB instead of 100 TB — and composes with the IVF
  * partition layout for further pruning. */
object Pq {

  /** Subspaces. */
  val M: Int = 4
  /** Dimensions per subspace. */
  val SubDim: Int = Ivf.Dim / M
  /** Codewords per subspace (2-bit codes). */
  val Ksub: Int = 4

  /** Subvector `m` (0-based) of the quantized vector column. */
  private def sub(qv: Column, m: Int): Column =
    slice(qv, m * SubDim + 1, SubDim)

  /** Integer squared-L2 distance from a subvector column to a literal
    * codeword. */
  private def distTo(sv: Column, cw: Array[Long]): Column =
    aggregate(zip_with(sv, lit(cw), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** `struct(dist, code)` argmin over a subspace codebook; ties to the
    * lowest code (lexicographic struct `least`). */
  private def nearest(sv: Column, codebook: Seq[(Long, Array[Long])]): Column =
    least(codebook.map { case (code, cw) =>
      struct(distTo(sv, cw).as("dist"), lit(code).as("code"))
    }: _*)

  /** One integer Lloyd update for subspace `m`. */
  private def lloydStep(q: DataFrame, m: Int,
      codebook: Seq[(Long, Array[Long])]): Seq[(Long, Array[Long])] = {
    val sv = sub(col("qv"), m)
    val sumCols = (1 to SubDim).map(j => sum(element_at(sv, j)).as(s"s$j"))
    q.withColumn("code", nearest(sv, codebook).getField("code"))
      .groupBy("code")
      .agg(count(lit(1)).as("n"), sumCols: _*)
      .collect()
      .map { r =>
        val n = r.getLong(1)
        r.getLong(0) -> Array.tabulate(SubDim)(j => r.getLong(j + 2) / n)
      }
      .sortBy(_._1).toSeq
  }

  /** Deterministic per-subspace training: seeds are the `Ksub` smallest
    * vec_ids' subvectors, then [[Ivf.LloydSteps]] integer updates. */
  def train(q: DataFrame): Seq[Seq[(Long, Array[Long])]] = {
    val seedRows = q.orderBy("vec_id").limit(Ksub).select("qv").collect()
    (0 until M).map { m =>
      val seeds: Seq[(Long, Array[Long])] = seedRows.zipWithIndex.map {
        case (r, i) =>
          (i.toLong,
            r.getSeq[Long](0).slice(m * SubDim, (m + 1) * SubDim).toArray)
      }.toSeq
      (1 to Ivf.LloydSteps).foldLeft(seeds)((c, _) => lloydStep(q, m, c))
    }
  }

  private val trainCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Seq[(Long, Array[Long])]]]()

  def trainCached(spark: SparkSession, dir: String): Seq[Seq[(Long, Array[Long])]] =
    trainCache.computeIfAbsent(
      graft.DatasetCache.snapshotKey(spark, dir, "embeddings.parquet"),
      _ => train(Ivf.quantized(spark, dir)))

  /** Force the one-time codebook training (bench isolation hook). */
  def prebuildCodebooks(spark: SparkSession, dir: String): Unit = {
    trainCached(spark, dir)
    ()
  }

  /** Map-only PQ encoding: (vec_id, qv, code_0..code_{M-1}). */
  private def encoded(spark: SparkSession, dir: String): DataFrame = {
    val books = trainCached(spark, dir)
    (0 until M).foldLeft(Ivf.quantized(spark, dir)) { (df, m) =>
      df.withColumn(s"code_$m",
        nearest(sub(col("qv"), m), books(m)).getField("code"))
    }
  }

  /** PQ codes per vector — the stored index relation. */
  def codes(spark: SparkSession, dir: String): DataFrame =
    encoded(spark, dir)
      .select(col("vec_id") +: (0 until M).map(m => col(s"code_$m")): _*)
      .orderBy("vec_id")

  /** ADC top-k: integer approximate distances via the query's per-
    * subspace lookup table, smallest first. The LUT indexing is
    * `element_at(lit(lutRow), code+1)` — a literal array probe inside
    * whole-stage codegen, the Spark expression of "M table lookups per
    * candidate". */
  def topK(queryId: Long, k: Int)(spark: SparkSession, dir: String): DataFrame = {
    val books = trainCached(spark, dir)
    val enc = encoded(spark, dir)
    enc.filter(col("vec_id") === queryId)
      .select("qv").collect().headOption match {
      case None => // unknown id: empty with the right schema, like the oracle
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id", LongType),
            org.apache.spark.sql.types.StructField("adc_dist", LongType))))
      case Some(row) =>
        val qv = row.getSeq[Long](0).toArray
        // LUT[m][j]: exact integer distance from query subvector m to
        // codeword j — codes index it, so absent codes (empty Lloyd
        // cells) never appear and order never matters
        val lut: Seq[Map[Long, Long]] = (0 until M).map { m =>
          val qs = qv.slice(m * SubDim, (m + 1) * SubDim)
          books(m).map { case (code, cw) =>
            code -> cw.iterator.zip(qs.iterator).map { case (c, x) =>
              val d = x - c; d * d
            }.sum
          }.toMap
        }
        val adc = (0 until M).map { m =>
          // map literal: codes are sparse if a cell emptied during Lloyd
          val pairs = lut(m).toSeq.sortBy(_._1)
          val mapCol = map(pairs.flatMap { case (c, d) =>
            Seq(lit(c), lit(d)) }: _*)
          element_at(mapCol, col(s"code_$m"))
        }.reduce(_ + _)
        enc.filter(col("vec_id") =!= queryId)
          .select(col("vec_id"), adc.as("adc_dist"))
          .orderBy(col("adc_dist").asc, col("vec_id").asc)
          .limit(k)
    }
  }

  // ---- DuckDB oracle: the same per-subspace chains in SQL --------------

  /** Per-subspace training + assignment chain. Mirrors [[Ivf.chainSql]]
    * with subspace slicing: `qs{m}` carries the subvector, the rest of
    * the chain is the identical quantize→seed→Lloyd→argmin shape. */
  private def subChainSql(m: Int, steps: Int): String = {
    val lo = m * SubDim
    val dist = (c: String, q: String) =>
      s"CAST(list_sum(list_transform(range(1,${SubDim + 1}), i -> ($q.sv[i]-$c.cv[i])*($q.sv[i]-$c.cv[i]))) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= s"""qs$m AS (
       |  SELECT vec_id, list_transform(range(1,${SubDim + 1}), i -> qv[$lo+i]) AS sv FROM q),
       |c0_$m AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, sv AS cv
       |  FROM qs$m ORDER BY vec_id LIMIT $Ksub)""".stripMargin
    (0 until steps).foreach { s =>
      sb ++= s""",
       |d${s}_$m AS (
       |  SELECT q.vec_id, q.sv, c.code, ${dist("c", "q")} AS dist
       |  FROM qs$m q, c${s}_$m c),
       |a${s}_$m AS (
       |  SELECT vec_id, sv, code FROM (
       |    SELECT vec_id, sv, code, row_number() OVER (PARTITION BY vec_id ORDER BY dist, code) AS rn FROM d${s}_$m)
       |  WHERE rn = 1),
       |c${s + 1}_$m AS (
       |  SELECT code, list(s ORDER BY i) AS cv FROM (
       |    SELECT code, i, CAST(sum(sv[i]) AS BIGINT) // CAST(count(*) AS BIGINT) AS s
       |    FROM a${s}_$m, range(1,${SubDim + 1}) AS t(i) GROUP BY code, i)
       |  GROUP BY code)""".stripMargin
    }
    sb ++= s""",
       |afin_$m AS (
       |  SELECT vec_id, code, dist FROM (
       |    SELECT q.vec_id, c.code, ${dist("c", "q")} AS dist,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY ${dist("c", "q")}, c.code) AS rn
       |    FROM qs$m q, c${steps}_$m c)
       |  WHERE rn = 1)""".stripMargin
    sb.toString
  }

  private def allChains: String = {
    val q = s"""q AS (
       |  SELECT vec_id, list_transform(embedding, v -> CAST(round((CAST(v AS DOUBLE)+${Ivf.Shift})*${Ivf.Scale}) AS BIGINT)) AS qv
       |  FROM embeddings)""".stripMargin
    (q +: (0 until M).map(m => subChainSql(m, Ivf.LloydSteps))).mkString(",\n")
  }

  val codesSql: String = {
    val joins = (0 until M).map(m =>
      s"JOIN afin_$m ON afin_$m.vec_id = q.vec_id").mkString(" ")
    val cols = (0 until M).map(m => s"afin_$m.code AS code_$m").mkString(", ")
    s"WITH $allChains SELECT q.vec_id, $cols FROM q $joins ORDER BY q.vec_id"
      .replace("\n", " ")
  }

  /** ADC distance in SQL: join each subspace's assignment to its final
    * codebook and sum the exact distances from the query's subvectors to
    * the ASSIGNED codewords — algebraically identical to the LUT. */
  def topKSql(queryId: Long, k: Int): String = {
    val perSub = (0 until M).map { m =>
      s"""(SELECT CAST(list_sum(list_transform(range(1,${SubDim + 1}), i -> (qq$m.sv[i]-cb$m.cv[i])*(qq$m.sv[i]-cb$m.cv[i]))) AS BIGINT)
         | FROM qs$m qq$m, c${Ivf.LloydSteps}_$m cb$m
         | WHERE qq$m.vec_id = $queryId AND cb$m.code = afin_$m.code)""".stripMargin
    }.mkString(" + ")
    val joins = (0 until M).map(m =>
      s"JOIN afin_$m ON afin_$m.vec_id = q.vec_id").mkString(" ")
    s"""WITH $allChains
       |SELECT q.vec_id, $perSub AS adc_dist
       |FROM q $joins
       |WHERE q.vec_id != $queryId
       |  AND EXISTS (SELECT 1 FROM q WHERE vec_id = $queryId)
       |ORDER BY adc_dist ASC, q.vec_id ASC LIMIT $k""".stripMargin.replace("\n", " ")
  }
}
