package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pc.PcSchema

/** Schema-metadata API (SURVEY §1.3): dimension tagging, validation
  * rules, and importance-field appending with auto-assigned order. */
class PcSchemaSpec extends AnyFunSuite {

  private val xyz = StructType(Seq(
    PcSchema.dimensionField("x", DoubleType, 1, location = true),
    PcSchema.dimensionField("y", DoubleType, 2, location = true),
    PcSchema.dimensionField("z", DoubleType, 3, location = true),
    StructField("intensity", IntegerType)))

  test("dimensions are returned in dimension order regardless of field order") {
    val shuffled = StructType(Seq(xyz("z"), xyz("intensity"), xyz("x"), xyz("y")))
    assert(PcSchema.dimensions(shuffled).map(_.name) == Seq("x", "y", "z"))
  }

  test("validate: needs >= 3 dimensions, all numeric") {
    assert(PcSchema.validate(xyz).isRight)
    val two = StructType(xyz.fields.take(2))
    assert(PcSchema.validate(two).isLeft)
    val badType = StructType(xyz.fields :+
      PcSchema.dimensionField("w", DoubleType, 4).copy(dataType = StringType))
    assert(PcSchema.validate(badType).isLeft)
  }

  test("addImportanceField appends with the next free dimension order") {
    val withI = PcSchema.addImportanceField(xyz)
    val dims = PcSchema.dimensions(withI)
    assert(dims.map(_.name) == Seq("x", "y", "z", "i"))
    assert(dims.last.metadata.getLong(PcSchema.DimensionKey) == 4L)
    assert(PcSchema.importance(withI).map(_.name).contains("i"))
    assert(withI("i").dataType == FloatType)
    // refuses to double-add
    intercept[IllegalArgumentException](PcSchema.addImportanceField(withI))
  }

  test("importance finds the tagged axis only") {
    assert(PcSchema.importance(xyz).isEmpty)
  }
}
