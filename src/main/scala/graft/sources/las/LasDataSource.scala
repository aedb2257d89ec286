package graft.sources.las

import java.nio.{ByteBuffer, ByteOrder}
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Hadoop-conf plumbing: the source must honor `spark.hadoop.*` settings
  * (custom filesystems, credentials) like any built-in file source.
  * Driver side we take the session's conf; executor side the readers get
  * it via a BROADCAST of [[SerializableHadoopConf]] (Configuration isn't
  * serializable) — one transfer per executor, like Spark's built-in file
  * sources, instead of re-shipping the full conf with every task. */
object LasHadoopConf {
  /** The active session's hadoop configuration, or a bare default when no
    * session exists (driver-side tools/tests outside Spark). */
  def sessionConf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}

/** Java-serializable Configuration wrapper (the standard Spark pattern;
  * the built-in `SerializableConfiguration` is private[spark]). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Spark DSv2 source for LAS point clouds — the faithful port of the
  * reference's custom provider (pc-io/src/las/source.rs:34-138,
  * pc-io/src/las/provider.rs:33-182), re-expressed on the connector API:
  *
  *  - one `InputPartition` per 512Ki-point slice per file (the
  *    reference's chunk-parallel decode — parallelism *between* tasks
  *    instead of a rayon pool inside one partition);
  *  - `SupportsPushDownRequiredColumns`: only requested fields decode;
  *  - `SupportsPushDownFilters`: x/y/z range predicates prune whole
  *    files against header bounds (I1) but remain residual — *inexact*
  *    pushdown, exactly the reference's contract
  *    (pc-io/src/las/provider.rs:91-118);
  *  - `SupportsReportStatistics`: exact row count + byte size from the
  *    headers (I5).
  *
  * Usage: `spark.read.format("las").load(path)` (or directory of .las).
  */
class LasDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "las"

  private def filesFor(options: CaseInsensitiveStringMap): Seq[String] = {
    val conf = LasHadoopConf.sessionConf()
    // Spark DSv2 passes multiple load() paths as a JSON array string
    // (DataSourceV2Utils.getOptionsWithPaths), NOT comma-separated
    def parsePaths(v: String): Seq[String] =
      if (v.trim.startsWith("[")) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        mapper.readValue(v, classOf[Array[String]]).toSeq
      } else v.split(",").toSeq
    val raw = Option(options.get("path")).toSeq ++
      Option(options.get("paths")).toSeq.flatMap(parsePaths)
    raw.flatMap { s =>
      val p = new Path(s)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile)
          .map(_.getPath.toString)
          .filter(f => f.toLowerCase.endsWith(".las") || f.toLowerCase.endsWith(".laz"))
      else Seq(s)
    }.sorted
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = filesFor(options)
    require(files.nonEmpty, "las source: no input files")
    val conf = LasHadoopConf.sessionConf()
    val headers = files.map(f => LasFormat.readHeader(conf, f))
    // widest schema every input format can serve (gps/rgb/extra_bytes
    // only when all files carry them)
    LasFormat.commonSchema(
      headers.map(_.pointFormat),
      headers.map(_.extraBytes))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val files = filesFor(new CaseInsensitiveStringMap(properties))
    val conf = LasHadoopConf.sessionConf()
    new LasTable(schema, files.map(f => f -> LasFormat.readHeader(conf, f)))
  }

  override def supportsExternalMetadata(): Boolean = false
}

class LasTable(schema: StructType, headers: Seq[(String, LasFormat.LasHeader)])
    extends Table with SupportsRead {
  override def name(): String = s"las(${headers.map(_._1).mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LasScanBuilder(schema, headers)
}

class LasScanBuilder(fullSchema: StructType,
    headers: Seq[(String, LasFormat.LasHeader)])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our field order/metadata; keep only requested names
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept x/y/z range predicates for header-bounds pruning; everything
    // stays residual (Inexact pushdown — Spark re-applies all filters)
    pushed = filters.filter(LasPruning.prunable)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new LasScan(fullSchema, required, headers, pushed)
}

/** Filter-vs-header-bounds interval logic (I1). */
object LasPruning {
  private val dims = Set("x", "y", "z")

  def prunable(f: Filter): Boolean = f match {
    case GreaterThan(a, v: Number) => dims(a)
    case GreaterThanOrEqual(a, v: Number) => dims(a)
    case LessThan(a, v: Number) => dims(a)
    case LessThanOrEqual(a, v: Number) => dims(a)
    case EqualTo(a, v: Number) => dims(a)
    case And(l, r) => prunable(l) && prunable(r)
    case Or(l, r) => prunable(l) && prunable(r)
    case _ => false
  }

  /** Can a record inside `bounds` possibly satisfy `f`? */
  def mayMatch(f: Filter, bounds: Map[String, (Double, Double)]): Boolean = f match {
    case GreaterThan(a, v: Number) =>
      bounds.get(a).forall(_._2 > v.doubleValue)
    case GreaterThanOrEqual(a, v: Number) =>
      bounds.get(a).forall(_._2 >= v.doubleValue)
    case LessThan(a, v: Number) =>
      bounds.get(a).forall(_._1 < v.doubleValue)
    case LessThanOrEqual(a, v: Number) =>
      bounds.get(a).forall(_._1 <= v.doubleValue)
    case EqualTo(a, v: Number) =>
      bounds.get(a).forall(b => b._1 <= v.doubleValue && v.doubleValue <= b._2)
    case And(l, r) => mayMatch(l, bounds) && mayMatch(r, bounds)
    case Or(l, r) => mayMatch(l, bounds) || mayMatch(r, bounds)
    case _ => true
  }
}

final case class LasInputPartition(
    path: String, pointFormat: Int, recordLength: Int, pointOffset: Long,
    start: Long, count: Long,
    sx: Double, sy: Double, sz: Double,
    ox: Double, oy: Double, oz: Double) extends InputPartition

/** A run of consecutive LAZ chunks (contiguous in the file — one read,
  * decoded chunk-by-chunk; chunks are the format's independent decode
  * units, mirroring the reference's chunk-table partitioning).
  * `extraCount` is the record's extra-bytes tail length. */
final case class LazInputPartition(
    path: String, pointFormat: Int, extraCount: Int,
    firstChunkOffset: Long, chunkBytes: Array[Long], chunkPoints: Array[Long],
    sx: Double, sy: Double, sz: Double,
    ox: Double, oy: Double, oz: Double) extends InputPartition

class LasScan(fullSchema: StructType, required: StructType,
    headers: Seq[(String, LasFormat.LasHeader)], pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  val ChunkRows: Long = 524288L // reference batch size (pc-io/src/config.rs:3)

  override def readSchema(): StructType = required

  /** Files surviving header-bounds pruning (I1). */
  private lazy val survivors: Seq[(String, LasFormat.LasHeader)] =
    headers.filter { case (_, h) =>
      pushed.forall(LasPruning.mayMatch(_, h.bounds))
    }

  override def planInputPartitions(): Array[InputPartition] =
    survivors.flatMap { case (f, h) =>
      if (h.laz.isEmpty) {
        (0L until h.pointCount by ChunkRows).map { start =>
          LasInputPartition(f, h.pointFormat, h.recordLength, h.pointOffset,
            start, math.min(ChunkRows, h.pointCount - start),
            h.scale._1, h.scale._2, h.scale._3,
            h.offset._1, h.offset._2, h.offset._3): InputPartition
        }
      } else {
        // LAZ: the chunk table defines the independent decode units; group
        // consecutive chunks into ~ChunkRows-point partitions (one
        // contiguous read each)
        val chunks = graft.sources.las.laz.LazFormat.readChunks(
          LasHadoopConf.sessionConf(), f, h)
        val groups = scala.collection.mutable.ArrayBuffer.empty[Vector[graft.sources.las.laz.LazFormat.LazChunk]]
        var cur = Vector.empty[graft.sources.las.laz.LazFormat.LazChunk]
        var curPoints = 0L
        chunks.foreach { c =>
          if (cur.nonEmpty && curPoints + c.pointCount > ChunkRows) {
            groups += cur; cur = Vector.empty; curPoints = 0L
          }
          cur :+= c; curPoints += c.pointCount
        }
        if (cur.nonEmpty) groups += cur
        groups.map { g =>
          LazInputPartition(f, h.pointFormat,
            h.extraBytes,
            g.head.fileOffset, g.map(_.byteLen).toArray, g.map(_.pointCount).toArray,
            h.scale._1, h.scale._2, h.scale._3,
            h.offset._1, h.offset._2, h.offset._3): InputPartition
        }
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new LasReaderFactory(
      required.fieldNames.map(LasFormat.fieldCode),
      spark.sparkContext.broadcast(
        new SerializableHadoopConf(LasHadoopConf.sessionConf())))
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(survivors.map { case (_, h) => h.pointCount * h.recordLength }.sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(survivors.map(_._2.pointCount).sum)
  }

  override def toBatch: Batch = this
}

class LasReaderFactory(fieldCodes: Array[Int],
    confBc: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {

  /** Project one decoded LAZ point through the semantic field codes
    * (same contract as [[LasFormat.decode]] for raw records); extended
    * records (formats 6-8) read the 4-bit returns / extFlags / i16 scan
    * angle / nir fields instead of the legacy packed byte. */
  private def projectLaz(pt: graft.sources.las.laz.LazPoint, p: LazInputPartition,
      out: Array[Any]): Unit = {
    val ext = LasFormat.isExtended(p.pointFormat)
    var i = 0
    while (i < fieldCodes.length) {
      out(i) = fieldCodes(i) match {
        case 0 => pt.x * p.sx + p.ox
        case 1 => pt.y * p.sy + p.oy
        case 2 => pt.z * p.sz + p.oz
        case 3 => pt.intensity
        case 4 =>
          if (ext) (pt.returns & 0x0f).toShort else (pt.flags & 0x07).toShort
        case 5 =>
          if (ext) ((pt.returns >> 4) & 0x0f).toShort
          else ((pt.flags >> 3) & 0x07).toShort
        case 6 =>
          if (ext) ((pt.extFlags >> 6) & 0x01).toShort
          else ((pt.flags >> 6) & 0x01).toShort
        case 7 =>
          if (ext) ((pt.extFlags >> 7) & 0x01) == 1
          else ((pt.flags >> 7) & 0x01) == 1
        case 8 => // legacy strips the flag bits like the reference's reader
          if (ext) pt.classification.toShort else (pt.classification & 0x1f).toShort
        case 9 => // i8 "rank" (legacy) vs i16 0.006-degree units (extended)
          if (ext) pt.scanAngle.toShort else pt.scanAngleRank.toByte.toShort
        case 10 => pt.userData.toShort
        case 11 => pt.pointSourceId
        case 12 => java.lang.Double.longBitsToDouble(pt.gpsTime)
        case 13 => pt.red
        case 14 => pt.green
        case 15 => pt.blue
        case 16 => ((pt.extFlags >> 4) & 0x03).toShort
        case 17 => pt.nir
        case 18 =>
          if (ext) (pt.extFlags & 0x01) == 1
          else ((pt.classification >> 5) & 0x01) == 1
        case 19 =>
          if (ext) ((pt.extFlags >> 1) & 0x01) == 1
          else ((pt.classification >> 6) & 0x01) == 1
        case 20 =>
          if (ext) ((pt.extFlags >> 2) & 0x01) == 1
          else ((pt.classification >> 7) & 0x01) == 1
        case 21 => ext && ((pt.extFlags >> 3) & 0x01) == 1
        case 22 => // degrees as f32
          if (ext) pt.scanAngle * 0.006f
          else pt.scanAngleRank.toByte.toFloat
        case 23 => pt.extra // decoders hand out a fresh array per point
      }
      i += 1
    }
  }

  private def createLazReader(p: LazInputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      import graft.sources.las.laz.LazFormat
      private val conf = confBc.value.value
      private val bytes = {
        val path = new Path(p.path)
        val in = path.getFileSystem(conf).open(path)
        try {
          val totalL = p.chunkBytes.sum
          require(totalL <= Int.MaxValue.toLong,
            s"LAZ partition too large to buffer: $totalL bytes")
          val buf = new Array[Byte](totalL.toInt)
          in.readFully(p.firstChunkOffset, buf)
          buf
        } finally in.close()
      }
      private val out = new Array[Any](fieldCodes.length)
      private var chunk = -1
      private var chunkStart = 0
      private var decoder: LazFormat.ChunkReader = null

      override def next(): Boolean = {
        while (decoder == null || !decoder.next()) {
          chunk += 1
          if (chunk >= p.chunkBytes.length) return false
          if (chunk > 0) chunkStart += p.chunkBytes(chunk - 1).toInt
          decoder =
            if (LasFormat.isExtended(p.pointFormat))
              // layered framing: only the projected layers decode
              new LazFormat.ChunkDecoder14(bytes, chunkStart,
                chunkStart + p.chunkBytes(chunk).toInt, p.pointFormat,
                p.chunkPoints(chunk), fieldCodes, p.extraCount)
            else
              new LazFormat.ChunkDecoder(bytes, chunkStart,
                chunkStart + p.chunkBytes(chunk).toInt, p.pointFormat,
                p.chunkPoints(chunk), p.extraCount)
        }
        true
      }

      override def get(): InternalRow = {
        projectLaz(decoder.point, p, out)
        new GenericInternalRow(out.clone())
      }

      override def close(): Unit = ()
    }

  /** Zero-column projections (`count()`) need no point bytes at all: the
    * row count is already exact from the header / chunk table, so emit
    * empty rows without opening the file — the extreme case of the
    * layered source's selective decompression. */
  private def createCountingReader(n: Long): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val empty = new GenericInternalRow(0)
      private var row = -1L
      override def next(): Boolean = { row += 1; row < n }
      override def get(): InternalRow = empty
      override def close(): Unit = ()
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = partition match {
    case laz: LazInputPartition if fieldCodes.isEmpty =>
      createCountingReader(laz.chunkPoints.sum)
    case las: LasInputPartition if fieldCodes.isEmpty =>
      createCountingReader(las.count)
    case laz: LazInputPartition => createLazReader(laz)
    case las: LasInputPartition => createLasReader(las)
  }

  private def createLasReader(p: LasInputPartition): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private val conf = confBc.value.value
      private val bytes = {
        val path = new Path(p.path)
        val in = path.getFileSystem(conf).open(path)
        try {
          val sizeL = p.count * p.recordLength.toLong
          require(sizeL <= Int.MaxValue.toLong,
            s"LAS chunk too large to buffer: $sizeL bytes " +
              s"(count=${p.count}, recordLength=${p.recordLength})")
          val buf = new Array[Byte](sizeL.toInt)
          in.readFully(p.pointOffset + p.start * p.recordLength, buf)
          buf
        } finally in.close()
      }
      private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      private val header = LasFormat.LasHeader(p.pointFormat, p.recordLength,
        p.count, 0L, (p.sx, p.sy, p.sz), (p.ox, p.oy, p.oz),
        (0, 0, 0), (0, 0, 0))
      private val out = new Array[Any](fieldCodes.length)
      private var row = -1L

      override def next(): Boolean = { row += 1; row < p.count }

      override def get(): InternalRow = {
        LasFormat.decode(bb, (row * p.recordLength).toInt, header, fieldCodes, out)
        new GenericInternalRow(out.clone())
      }

      override def close(): Unit = ()
    }
  }
}
