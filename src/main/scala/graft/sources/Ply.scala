package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.pc.PcSchema

/** PLY point-cloud reader/writer (reference: pc-io/src/ply.rs:39-360).
  *
  * PLY is a test-fixture-scale format in the reference (its own asset is
  * 10k points), so — matching the reference's single-pass design — the
  * reader parses on the driver and hands Spark a local DataFrame, and
  * the writer streams `toLocalIterator` (constant driver memory). Large
  * clouds live in Parquet; PLY exists for viz import/export parity.
  *
  * Supported: ascii / binary_little_endian / binary_big_endian formats,
  * scalar vertex properties of the 8 PLY numeric types, arbitrary extra
  * elements (skipped). Unsigned types widen like the LAS mapping
  * (SURVEY.md §1.4): uchar→Short, ushort→Int, uint→Long.
  */
object Ply {

  /** PLY property type → (Spark type, byte width). */
  private val typeMap: Map[String, (DataType, Int)] = Map(
    "char" -> (ByteType, 1), "int8" -> (ByteType, 1),
    "uchar" -> (ShortType, 1), "uint8" -> (ShortType, 1),
    "short" -> (ShortType, 2), "int16" -> (ShortType, 2),
    "ushort" -> (IntegerType, 2), "uint16" -> (IntegerType, 2),
    "int" -> (IntegerType, 4), "int32" -> (IntegerType, 4),
    "uint" -> (LongType, 4), "uint32" -> (LongType, 4),
    "float" -> (FloatType, 4), "float32" -> (FloatType, 4),
    "double" -> (DoubleType, 8), "float64" -> (DoubleType, 8))

  /** Inverse map for writing (canonical PLY names). */
  private def plyTypeOf(dt: DataType): String = dt match {
    case ByteType => "char"
    case ShortType => "short"
    case IntegerType => "int"
    case LongType => "int" // PLY has no int64; clamp to int range at write
    case FloatType => "float"
    case DoubleType => "double"
    case other => throw new IllegalArgumentException(s"non-numeric PLY column: $other")
  }

  final case class PlyProperty(name: String, plyType: String) {
    def sparkType: DataType = typeMap(plyType)._1
    def width: Int = typeMap(plyType)._2
  }
  final case class PlyElement(name: String, count: Long, props: Seq[PlyProperty])
  final case class PlyHeader(format: String, elements: Seq[PlyElement])

  private def readHeaderLine(in: DataInputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') { sb.append(c.toChar); c = in.read() }
    if (c == -1) throw new EOFException("PLY header truncated")
    sb.toString.stripSuffix("\r")
  }

  /** Parse the header from the stream (consumes through `end_header`). */
  def parseHeader(in: DataInputStream): PlyHeader = {
    require(readHeaderLine(in) == "ply", "not a PLY file (missing magic)")
    var format: String = null
    val elements = scala.collection.mutable.ArrayBuffer.empty[PlyElement]
    var done = false
    while (!done) {
      val line = readHeaderLine(in)
      line.split("\\s+").toSeq match {
        case Seq("format", f, _) => format = f
        case Seq("comment", _*) | Seq("obj_info", _*) => ()
        case Seq("element", name, n) =>
          elements += PlyElement(name, n.toLong, Vector.empty)
        case Seq("property", "list", _, _, _) =>
          throw new IllegalArgumentException(
            s"list properties are not supported (element `${elements.last.name}`)")
        case Seq("property", t, name) =>
          require(typeMap.contains(t), s"unknown PLY type: $t")
          val last = elements.last
          elements(elements.size - 1) =
            last.copy(props = last.props :+ PlyProperty(name, t))
        case Seq("end_header") => done = true
        case other => throw new IllegalArgumentException(s"bad header line: $line")
      }
    }
    require(format != null, "PLY header missing format line")
    PlyHeader(format, elements.toSeq)
  }

  private def schemaOf(el: PlyElement): StructType = StructType(el.props.map { p =>
    val base = StructField(p.name, p.sparkType, nullable = false)
    p.name match {
      case "x" => PcSchema.dimensionField("x", p.sparkType, 1, location = true)
      case "y" => PcSchema.dimensionField("y", p.sparkType, 2, location = true)
      case "z" => PcSchema.dimensionField("z", p.sparkType, 3, location = true)
      case "i" => PcSchema.dimensionField("i", p.sparkType, 4, importance = true)
      case _ => base
    }
  })

  private def parseAsciiValue(p: PlyProperty, tok: String): Any = p.sparkType match {
    case ByteType => tok.toByte
    case ShortType => tok.toShort
    case IntegerType => tok.toInt
    case LongType => tok.toLong
    case FloatType => tok.toFloat
    case DoubleType => tok.toDouble
    case _ => throw new IllegalStateException
  }

  private def readBinaryValue(p: PlyProperty, bb: ByteBuffer): Any = p.plyType match {
    case "char" | "int8" => bb.get()
    case "uchar" | "uint8" => (bb.get() & 0xff).toShort
    case "short" | "int16" => bb.getShort
    case "ushort" | "uint16" => bb.getShort & 0xffff
    case "int" | "int32" => bb.getInt
    case "uint" | "uint32" => bb.getInt.toLong & 0xffffffffL
    case "float" | "float32" => bb.getFloat
    case "double" | "float64" => bb.getDouble
  }

  /** Read a PLY file's `vertex` element into a DataFrame with PC:*
    * metadata on x/y/z(/i). Elements before `vertex` are consumed and
    * skipped; elements after are ignored. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
    try {
      val header = parseHeader(in)
      val ascii = header.format == "ascii"
      val order =
        if (header.format == "binary_big_endian") ByteOrder.BIG_ENDIAN
        else ByteOrder.LITTLE_ENDIAN
      var rows: Seq[Row] = null
      var schema: StructType = null
      header.elements.foreach { el =>
        val isVertex = el.name == "vertex" && rows == null
        if (ascii) {
          val parsed = (0L until el.count).iterator.map { _ =>
            val toks = readHeaderLine(in).trim.split("\\s+")
            if (isVertex)
              Row.fromSeq(el.props.zip(toks).map { case (pr, t) => parseAsciiValue(pr, t) })
            else null
          }
          if (isVertex) { rows = parsed.toVector; schema = schemaOf(el) }
          else parsed.foreach(_ => ()) // consume + discard
        } else {
          val rowBytes = el.props.map(_.width).sum
          val buf = new Array[Byte](rowBytes)
          val parsed = (0L until el.count).iterator.map { _ =>
            in.readFully(buf)
            if (isVertex) {
              val bb = ByteBuffer.wrap(buf).order(order)
              Row.fromSeq(el.props.map(readBinaryValue(_, bb)))
            } else null
          }
          if (isVertex) { rows = parsed.toVector; schema = schemaOf(el) }
          else parsed.foreach(_ => ())
        }
      }
      require(rows != null, s"no `vertex` element in $path")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, math.max(1, rows.size / 524288 + 1)),
        schema)
    } finally in.close()
  }

  private def fmtAscii(dt: DataType, v: Any): String = v match {
    case f: Float => if (f == f.longValue.toFloat) f.longValue.toString else f.toString
    case d: Double => if (d == d.longValue.toDouble) d.longValue.toString else d.toString
    case other => other.toString
  }

  /** Write a DataFrame of numeric columns as a PLY vertex element.
    * Streams `toLocalIterator`, so driver memory stays constant; the
    * row count comes from a cheap `count()` first (PLY headers are
    * count-prefixed — same constraint the reference works under). */
  def write(df: DataFrame, path: String, format: String = "binary_little_endian"): Unit = {
    require(Seq("ascii", "binary_little_endian", "binary_big_endian").contains(format))
    val n = df.count()
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val fields = df.schema.fields
      val header = new StringBuilder
      header ++= "ply\n"
      header ++= s"format $format 1.0\n"
      header ++= s"element vertex $n\n"
      fields.foreach(f => header ++= s"property ${plyTypeOf(f.dataType)} ${f.name}\n")
      header ++= "end_header\n"
      out.write(header.toString.getBytes(StandardCharsets.US_ASCII))
      val order =
        if (format == "binary_big_endian") ByteOrder.BIG_ENDIAN
        else ByteOrder.LITTLE_ENDIAN
      val it = df.toLocalIterator()
      if (format == "ascii") {
        while (it.hasNext) {
          val r = it.next()
          val line = fields.indices.map(i => fmtAscii(fields(i).dataType, r.get(i)))
            .mkString("", " ", "\n")
          out.write(line.getBytes(StandardCharsets.US_ASCII))
        }
      } else {
        val rowBytes = fields.map(f => f.dataType match {
          case ByteType => 1
          case ShortType => 2
          case IntegerType | LongType | FloatType => 4
          case DoubleType => 8
          case other => throw new IllegalArgumentException(other.toString)
        }).sum
        val bb = ByteBuffer.allocate(rowBytes).order(order)
        while (it.hasNext) {
          val r = it.next()
          bb.clear()
          fields.indices.foreach { i =>
            fields(i).dataType match {
              case ByteType => bb.put(r.getByte(i))
              case ShortType => bb.putShort(r.getShort(i))
              case IntegerType => bb.putInt(r.getInt(i))
              case LongType => // clamp (not wrap) to int32 — PLY has no int64
                val v = r.getLong(i)
                bb.putInt(math.max(Int.MinValue.toLong, math.min(Int.MaxValue.toLong, v)).toInt)
              case FloatType => bb.putFloat(r.getFloat(i))
              case DoubleType => bb.putDouble(r.getDouble(i))
              case _ => throw new IllegalStateException
            }
          }
          out.write(bb.array(), 0, rowBytes)
        }
      }
    } finally out.close()
  }
}
