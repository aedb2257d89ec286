package graft.pc

import org.apache.spark.sql.types._

/** Point-cloud schema metadata, mirroring the reference's Arrow field
  * metadata keys (reference: pc-format/src/schema.rs:11-17).
  *
  * A point-cloud table is an ordinary DataFrame whose schema tags some
  * numeric fields as indexable dimensions. `StructField.metadata` plays
  * the role Arrow field metadata plays in the reference.
  */
object PcSchema {
  /** Field is an indexable dimension; the value is its dimension order
    * (reference: pc-format/src/schema.rs:8-11). */
  val DimensionKey = "PC:dimension"
  /** Dimension is a spatial location axis (x/y/z)
    * (reference: pc-format/src/schema.rs:13). */
  val LocationKey = "PC:location"
  /** Dimension is the level-of-detail / importance axis
    * (reference: pc-format/src/schema.rs:14). */
  val ImportanceKey = "PC:importance"
  /** Grid transform for raw integer coordinates
    * (reference: pc-format/src/schema.rs:16-17). */
  val OffsetKey = "PC:offset"
  val ScaleKey = "PC:scale"

  private val numericTypes: Set[DataType] = Set(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  def isNumeric(dt: DataType): Boolean = numericTypes.contains(dt)

  /** Tag a field as dimension `order`, optionally as a location axis. */
  def dimensionField(
      name: String,
      dataType: DataType,
      order: Int,
      location: Boolean = false,
      importance: Boolean = false): StructField = {
    val mb = new MetadataBuilder().putLong(DimensionKey, order.toLong)
    if (location) mb.putString(LocationKey, name)
    if (importance) mb.putString(ImportanceKey, "random")
    StructField(name, dataType, nullable = false, mb.build())
  }

  /** Dimension fields in dimension order
    * (reference: pc-format/src/schema.rs:20-29). */
  def dimensions(schema: StructType): Seq[StructField] =
    schema.fields.toIndexedSeq
      .filter(_.metadata.contains(DimensionKey))
      .sortBy(_.metadata.getLong(DimensionKey))

  /** The importance field, if tagged
    * (reference: pc-format/src/schema.rs:32-41). */
  def importance(schema: StructType): Option[StructField] =
    schema.fields.find(_.metadata.contains(ImportanceKey))

  /** Validation: >= 3 dimensions, all numeric
    * (reference: pc-format/src/schema.rs:76-97). */
  def validate(schema: StructType): Either[String, Unit] = {
    val dims = dimensions(schema)
    if (dims.size < 3)
      Left(s"point-cloud schema needs >= 3 dimensions, got ${dims.size}")
    else
      dims.find(f => !isNumeric(f.dataType)) match {
        case Some(bad) => Left(s"dimension `${bad.name}` is not numeric: ${bad.dataType}")
        case None => Right(())
      }
  }

  /** Append an importance field with the next free dimension order
    * (reference: pc-format/src/schema.rs:44-73). */
  def addImportanceField(
      schema: StructType,
      name: String = "i",
      dataType: DataType = FloatType): StructType = {
    require(!schema.fieldNames.contains(name), s"field `$name` already exists")
    val nextOrder =
      dimensions(schema).lastOption
        .map(_.metadata.getLong(DimensionKey).toInt + 1)
        .getOrElse(1)
    StructType(schema.fields :+
      dimensionField(name, dataType, nextOrder, importance = true))
  }

  /** Canonical dimension sets (reference: pc-format/src/dims.rs:6-22). */
  sealed abstract class Dims(val names: Seq[String])
  case object XY extends Dims(Seq("x", "y"))
  case object XYZ extends Dims(Seq("x", "y", "z"))
  case object XYI extends Dims(Seq("x", "y", "i"))
  case object XYZI extends Dims(Seq("x", "y", "z", "i"))
}
