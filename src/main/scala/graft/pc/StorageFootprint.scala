package graft.pc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-footprint experiment (reference: README.md:48-71): convert one
  * point cloud into the paper's six Parquet configurations —
  * {raw i32 grid coords | resolved f64} × {uncompressed | zstd} and, for
  * the resolved variants, ± importance — then report bytes written and
  * the amplification ratio against the input size.
  *
  * Raw grid coordinates store `round((v - offset) / scale)` as Int32 and
  * record the transform in `PC:offset` / `PC:scale` field metadata
  * (reference: pc-io/src/las/schema.rs:11-37); resolving back is a pure
  * projection. The reference divides by the LAZ size; the denominator
  * here is the given input's byte size, so pointing the CLI at a LAZ
  * input (readable since the `graft.sources.las.laz` codec) reproduces
  * the paper's converted/LAZ amplification directly, and a LAS input
  * gives the PDAL-LAS comparison row instead.
  *
  * Sizes come from the filesystem after each write — one job per config,
  * embarrassingly parallel across configs at any scale.
  */
object StorageFootprint {

  final case class Config(name: String, raw: Boolean, compression: String,
      importance: Boolean)

  /** The paper's six conversion configs (README.md:52-64). */
  val Configs: Seq[Config] = Seq(
    Config("i32_uncompressed", raw = true, "uncompressed", importance = false),
    Config("f64_uncompressed", raw = false, "uncompressed", importance = false),
    Config("f64_uncompressed_importance", raw = false, "uncompressed", importance = true),
    Config("i32_zstd", raw = true, "zstd", importance = false),
    Config("f64_zstd", raw = false, "zstd", importance = false),
    Config("f64_zstd_importance", raw = false, "zstd", importance = true))

  /** Project x/y/z to raw Int32 grid coordinates with PC:offset/PC:scale
    * metadata. */
  def toRawGrid(df: DataFrame, scale: Double, offset: Double = 0.0): DataFrame = {
    val rawCols = df.schema.fields.map { f =>
      if (Seq("x", "y", "z").contains(f.name)) {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
          .putDouble(PcSchema.ScaleKey, scale)
          .putDouble(PcSchema.OffsetKey, offset)
        round((col(f.name) - lit(offset)) / lit(scale)).cast(IntegerType)
          .as(f.name, mb.build())
      } else col(f.name)
    }
    df.select(rawCols.toIndexedSeq: _*)
  }

  /** Resolve raw grid coordinates back to doubles from field metadata. */
  def resolveRawGrid(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.metadata.contains(PcSchema.ScaleKey))
        (col(f.name).cast(DoubleType) * f.metadata.getDouble(PcSchema.ScaleKey)
          + f.metadata.getDouble(PcSchema.OffsetKey)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Run all six conversions of `points` (x/y/z double columns + any
    * attributes) under `outDir`; returns one row per config:
    * (config, bytes, amplification_ppm = bytes * 1e6 / inputBytes). */
  def run(spark: SparkSession, points: DataFrame, outDir: String,
      inputBytes: Long, scale: Double = 0.001,
      rowGroupRows: Long = Layout.BatchSize, seed: Long = 42L): DataFrame = {
    val rows = Configs.map { c =>
      val base = if (c.importance) Points.withImportance(points, seed) else points
      val df = if (c.raw) toRawGrid(base, scale) else base
      val path = s"$outDir/${c.name}"
      df.write.mode("overwrite")
        .option("compression", c.compression)
        .option("maxRecordsPerFile", rowGroupRows)
        .parquet(path)
      val bytes = dirBytes(spark, path)
      // BigInt: bytes * 1e6 overflows Long past ~9.2 TB of output
      val ppm = (BigInt(bytes) * 1000000 / BigInt(math.max(1L, inputBytes))).toLong
      Row(c.name, bytes, ppm)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("config", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("amplification_ppm", LongType, nullable = false))))
  }
}
