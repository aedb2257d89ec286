package graft.pc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-cloud table construction.
  *
  * The driver testdata is relational (TPC-H-ish), so the point cloud is
  * *synthesized* deterministically from `lineitem` with pure integer
  * arithmetic (multiplicative hashing mod a small domain). Every derived
  * coordinate is exactly reproducible in ANSI SQL (the DuckDB oracle runs
  * the same arithmetic), which makes all spatial queries hash-comparable
  * bit-for-bit: bigint ops are exact, and bigint->double conversion plus
  * one IEEE-754 division are correctly rounded and identical across
  * engines.
  *
  * Domain: x, y in [0, 1000), z in [0, 100), i in [0, 1) — mirroring the
  * reference's (x, y, importance) model where z never partitions
  * (reference: pc-cli/src/partition.rs:188-194).
  */
object Points {
  /** Multiplicative-hash constants (Knuth / xxHash-style odd primes). */
  private val AX = 2654435761L
  private val BX = 1013904223L
  private val AY = 1597334677L
  private val BY = 2246822519L
  private val AZ = 3266489917L
  private val BZ = 668265263L
  private val AI = 374761393L
  private val BI = 285262861L

  /** The same derivation as SQL text, for DuckDB oracles. The explicit
    * BIGINT cast on l_linenumber (int32) prevents 32-bit overflow in
    * engines that multiply in the operand type. */
  val pointsSql: String =
    s"""SELECT
       |  l_orderkey * 8 + CAST(l_linenumber AS BIGINT) AS pid,
       |  ((l_orderkey * $AX + CAST(l_linenumber AS BIGINT) * $BX) % 1000000) / 1000.0 AS x,
       |  ((l_orderkey * $AY + CAST(l_linenumber AS BIGINT) * $BY) % 1000000) / 1000.0 AS y,
       |  ((l_partkey * $AZ + l_suppkey * $BZ) % 100000) / 1000.0 AS z,
       |  ((l_orderkey * $AI + CAST(l_linenumber AS BIGINT) * $BI) % 1048576) / 1048576.0 AS i
       |FROM lineitem""".stripMargin.replace("\n", " ")

  /** Synthesize the point-cloud DataFrame from `dir`/lineitem.parquet.
    * Columns: pid bigint, x/y/z/i double, with PC:* metadata attached. */
  def fromLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.DatasetCache.readTable(spark, dir, "lineitem.parquet")
    val ok = col("l_orderkey")
    val ln = col("l_linenumber").cast(LongType)
    val pk = col("l_partkey")
    val sk = col("l_suppkey")
    val df = li.select(
      (ok * 8 + ln).as("pid"),
      (((ok * AX + ln * BX) % 1000000L) / 1000.0).as("x"),
      (((ok * AY + ln * BY) % 1000000L) / 1000.0).as("y"),
      (((pk * AZ + sk * BZ) % 100000L) / 1000.0).as("z"),
      (((ok * AI + ln * BI) % 1048576L) / 1048576.0).as("i"))
    withPcMetadata(df)
  }

  /** Attach PC:dimension / PC:location / PC:importance metadata to the
    * canonical x/y/z/i columns (reference: pc-format/src/schema.rs:11-17). */
  def withPcMetadata(df: DataFrame): DataFrame = {
    def tag(c: String, order: Int, loc: Boolean, imp: Boolean): Metadata = {
      val mb = new MetadataBuilder().putLong(PcSchema.DimensionKey, order.toLong)
      if (loc) mb.putString(PcSchema.LocationKey, c)
      if (imp) mb.putString(PcSchema.ImportanceKey, "random")
      mb.build()
    }
    val cols = df.columns.map {
      case "x" => col("x").as("x", tag("x", 1, loc = true, imp = false))
      case "y" => col("y").as("y", tag("y", 2, loc = true, imp = false))
      case "z" => col("z").as("z", tag("z", 3, loc = true, imp = false))
      case "i" => col("i").as("i", tag("i", 4, loc = false, imp = true))
      case c => col(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** D1: append a uniform-random importance column i ~ U[0,1). The
    * reference leaves this unseeded (pc-format/src/compute.rs:37); we seed
    * for test stability (SURVEY.md §7.4.2). */
  def withImportance(df: DataFrame, seed: Long = 42L, colName: String = "i"): DataFrame =
    withPcMetadata(df.withColumn(colName, rand(seed).cast(FloatType)))

  /** Half-open box predicate `lo <= d < hi` per dimension; the importance
    * upper bound is closed at >= 1.0 (pc-format/src/compute.rs:186-190). */
  def boxPredicate(box: Aabb): Column =
    box.names.indices.map { d =>
      val c = col(box.names(d))
      val rightOpen = !(box.names(d) == "i" && box.upper(d) >= 1.0)
      val right = if (rightOpen) c < box.upper(d) else c <= box.upper(d)
      c >= box.lower(d) && right
    }.reduce(_ && _)

  /** Same predicate as SQL text for the DuckDB oracle. */
  def boxPredicateSql(box: Aabb): String =
    box.names.indices.map { d =>
      val n = box.names(d)
      val rightOpen = !(n == "i" && box.upper(d) >= 1.0)
      val op = if (rightOpen) "<" else "<="
      s"$n >= ${box.lower(d)} AND $n $op ${box.upper(d)}"
    }.mkString(" AND ")

  /** A2: global per-dimension bounds in ONE aggregate (the reference loops
    * one query per dimension — pc-format/src/expressions.rs:18-105). */
  def bounds(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"${d}_min"), max(col(d)).as(s"${d}_max")))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Driver-side Aabb from the bounds row. */
  def dataBounds(df: DataFrame, dims: Seq[String]): Aabb = {
    val row = bounds(df, dims).head()
    Aabb(dims.toVector,
      dims.indices.map(d => row.getDouble(2 * d)).toVector,
      dims.indices.map(d => row.getDouble(2 * d + 1)).toVector)
  }
}
