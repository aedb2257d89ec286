package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Random-projection (Johnson–Lindenstrauss) dimensionality reduction as
  * an ANN tier: project the 64-dim vectors onto [[RDim]] fixed ±1
  * directions (Achlioptas's database-friendly JL variant — sign
  * matrices preserve squared L2 distances in expectation with the same
  * O(ε²) concentration as Gaussians), rank candidates by squared L2 in
  * the 16-dim projected space, exact-rerank a short shortlist. The
  * third compression geometry next to [[Sq8]] (per-dim quantization)
  * and [[Pq]] (subspace codebooks): here the DIMENSIONS are compressed,
  * not the values.
  *
  * **Determinism contract.** Projections run over [[Ivf.quantized]]'s
  * int64 components with literal ±1 rows — exact integer sums, no float
  * order-dependence anywhere before the final exact rerank (whose
  * sequential-sum `fvec_dot` the whole sim surface shares). The shift
  * in `qv` cancels in the query−candidate difference, so no centering
  * is needed. The oracle replays the same literal matrix in SQL.
  *
  * **Scale design.** The projection is a map-only codegen'd expression
  * (the matrix is 16×64 literals; at scale the projected vectors — 128 B
  * — would be persisted once like [[Pq.codeIndex]] and scanned instead
  * of the 256 B floats). The shortlist is TakeOrderedAndProject; only
  * `shortlist` float rows are read exactly.
  */
object Rproj {

  val Dim: Int = Ivf.Dim
  val RDim: Int = 16

  /** Fixed ±1 projection rows derived from md5 parity (reproducible
    * anywhere; embedded as literals in the oracle SQL) — the same
    * construction as [[SimOps.planes]], disjoint seed namespace. */
  val signs: Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(RDim, Dim) { (r, d) =>
      val b = md.digest(s"rp$r-$d".getBytes("UTF-8"))(0)
      if ((b & 1) == 1) 1L else -1L
    }
  }

  /** Squared L2 distance in the projected space: `Σ_r (s_r · (qv −
    * qqv))²` through [[LongVecProjSqDist]], the native loop kernel (the
    * 16 per-row HOF dot products it replaces were CodegenFallback —
    * interpreted — like every `aggregate`/`zip_with` distance; pinned
    * row-identical by `RetrievalOpsSpec`). The sign matrix rides
    * row-major as one reference array. */
  private def adCol(a: Column, b: Column): Column =
    call_function("proj_sqdist", a, b, typedLit(signs.flatten.toSeq))

  /** JL top-k: project (map-only), shortlist by projected distance,
    * exact cosine rerank. */
  def topK(queryId: Long, shortlist: Int, k: Int)(
      spark: SparkSession, dir: String): DataFrame = {
    val q = Ivf.quantized(spark, dir).select("vec_id", "qv")
    val qq = q.filter(col("vec_id") === queryId).select(col("qv").as("qqv"))
    val short = q.crossJoin(broadcast(qq))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), adCol(col("qv"), col("qqv")).as("ad"))
      .orderBy(col("ad").asc, col("vec_id").asc)
      .limit(shortlist)
      .select("vec_id")
    val qe = SimOps.embeddings(spark, dir)
      .filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    SimOps.embeddings(spark, dir)
      .join(broadcast(short), "vec_id") // k-bounded shortlist: hint OK
      .crossJoin(broadcast(qe))
      .select(col("vec_id"),
        round(SimOps.dot(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Oracle: quantize → difference arrays → the same 16 literal-row
    * projected distances → shortlist → the shared exact rerank tail. */
  def topKSql(queryId: Long, shortlist: Int, k: Int): String = {
    val adTerms = (0 until RDim).map { r =>
      val lst = signs(r).mkString("[", ",", "]")
      val t = s"CAST(list_sum(list_transform(range(1, ${Dim + 1}), " +
        s"i -> dv[i] * ($lst::BIGINT[])[i])) AS BIGINT)"
      s"($t * $t)"
    }
    s"""WITH ${Ivf.qCteSql},
       |qq AS (SELECT qv AS qqv FROM q WHERE vec_id = $queryId),
       |dvr AS (
       |  SELECT vec_id, list_transform(range(1, ${Dim + 1}), i -> qv[i] - qqv[i]) AS dv
       |  FROM q, qq WHERE vec_id != $queryId),
       |short AS (
       |  SELECT vec_id FROM dvr
       |  ORDER BY ${adTerms.mkString(" + ")} ASC, vec_id ASC
       |  LIMIT $shortlist)
       |${Sq8.rerankTailSql(queryId, k)}""".stripMargin.replace("\n", " ")
  }
}
