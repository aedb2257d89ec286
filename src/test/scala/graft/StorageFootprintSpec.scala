package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.pc.{Points, StorageFootprint}

/** The paper's six-config storage-footprint conversion experiment. */
class StorageFootprintSpec extends SparkSpec {

  private lazy val points = Points.fromLineitem(spark, sf001).select("x", "y", "z", "pid")

  test("all six configs write; compression and raw-grid shrink the footprint") {
    val dir = Files.createTempDirectory("footprint").toString
    val sizes = StorageFootprint
      .run(spark, points, dir, inputBytes = 1000000L, rowGroupRows = 4096L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == StorageFootprint.Configs.map(_.name).toSet)
    assert(sizes.values.forall(_ > 0))
    // zstd compresses each coordinate variant
    assert(sizes("f64_zstd") < sizes("f64_uncompressed"))
    assert(sizes("i32_zstd") < sizes("i32_uncompressed"))
    // raw i32 grid is narrower than resolved f64
    assert(sizes("i32_uncompressed") < sizes("f64_uncompressed"))
    // the importance column costs bytes
    assert(sizes("f64_uncompressed_importance") > sizes("f64_uncompressed"))
    assert(sizes("f64_zstd_importance") > sizes("f64_zstd"))
  }

  test("raw grid coordinates resolve back within half a grid step") {
    val dir = Files.createTempDirectory("rawgrid").toString
    val scale = 0.001
    StorageFootprint.toRawGrid(points, scale)
      .write.mode("overwrite").parquet(s"$dir/raw")
    val raw = spark.read.parquet(s"$dir/raw")
    assert(raw.schema("x").dataType == IntegerType)
    assert(raw.schema("x").metadata.getDouble("PC:scale") == scale)
    val resolved = StorageFootprint.resolveRawGrid(raw)
    val joined = resolved.as("r").join(points.as("p"), "pid")
      .select(abs(col("r.x") - col("p.x")).as("dx"),
        abs(col("r.y") - col("p.y")).as("dy"))
    val worst = joined.agg(max("dx"), max("dy")).head()
    assert(worst.getDouble(0) <= scale / 2 + 1e-9)
    assert(worst.getDouble(1) <= scale / 2 + 1e-9)
  }
}
