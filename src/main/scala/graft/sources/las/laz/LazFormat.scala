package graft.sources.las.laz

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.las.LasFormat
import graft.sources.las.LasFormat.LasPoint

/** LAZ (LASzip) container plumbing: the laszip VLR, the chunk table, and
  * chunk-at-a-time encode/decode over the item codecs in [[LazItems]].
  *
  * Layout (public LASzip container format, pointwise-chunked compressor):
  * a LAS header whose point-format byte has the 0x80 compressed bit, one
  * `laszip encoded` VLR (record 22204) describing coder + items + chunk
  * size, then at the point-data offset an i64 pointer to the chunk
  * table, followed by the chunks themselves. Each chunk stores its first
  * point raw and arithmetic-codes the rest; chunks are independent — the
  * unit of parallel decode (reference: pc-io/src/las/source.rs:159-208
  * builds its scan partitions from exactly this table via laz-rs).
  *
  * Byte-level compatibility with laszip-written files cannot be verified
  * in this sandbox (no sample files, no codec library, no egress), so
  * the contract tested here is self-consistency: encode→decode identity
  * property tests plus LAZ-vs-LAS equality through the DSv2 source.
  */
object LazFormat {

  val LaszipUserId = "laszip encoded"
  val LaszipRecordId = 22204
  /** Pointwise chunked compressor id. */
  val CompressorChunked = 2
  val DefaultChunkSize = 50000

  val ItemPoint10 = 6
  val ItemGpstime11 = 7
  val ItemRgb12 = 8

  /** type → (size, version) for the items this codec speaks. */
  private val ItemSpec = Map(
    ItemPoint10 -> (20, 2),
    ItemGpstime11 -> (8, 2),
    ItemRgb12 -> (6, 2))

  /** Sentinel chunk size (0xFFFFFFFF in the VLR) marking variable-size
    * chunking: per-chunk point counts live in the chunk table. */
  val VariableChunkSize: Int = -1

  final case class LazVlr(compressor: Int, chunkSize: Int, items: Seq[Int]) {
    require(compressor == CompressorChunked,
      s"unsupported LAZ compressor $compressor (only pointwise-chunked=2)")
    require(items.forall(ItemSpec.contains),
      s"unsupported LAZ items $items (only POINT10/GPSTIME11/RGB12 v2)")
    // 0xFFFFFFFF reads back as -1: variable-size chunking, point counts
    // in the chunk table. Anything else non-positive is a corrupt VLR
    // and must fail loudly here, not decode garbage via a nonsense
    // fixed count downstream.
    require(chunkSize > 0 || chunkSize == VariableChunkSize,
      s"corrupt LAZ chunk size $chunkSize (positive fixed size or " +
        "0xFFFFFFFF variable marker)")
    def variable: Boolean = chunkSize == VariableChunkSize
  }

  def itemsFor(pointFormat: Int): Seq[Int] =
    Seq(ItemPoint10) ++
      (if (LasFormat.hasGps(pointFormat)) Seq(ItemGpstime11) else Nil) ++
      (if (LasFormat.hasRgb(pointFormat)) Seq(ItemRgb12) else Nil)

  def vlrPayload(pointFormat: Int, chunkSize: Int): Array[Byte] = {
    val items = itemsFor(pointFormat)
    val bb = ByteBuffer.allocate(34 + 6 * items.size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(CompressorChunked.toShort)
    bb.putShort(0) // coder: arithmetic
    bb.put(2.toByte) // version major
    bb.put(2.toByte) // version minor
    bb.putShort(0) // revision
    bb.putInt(0) // options
    bb.putInt(chunkSize)
    bb.putLong(-1L) // number of special evlrs (none)
    bb.putLong(-1L) // offset to special evlrs
    bb.putShort(items.size.toShort)
    items.foreach { t =>
      val (size, version) = ItemSpec(t)
      bb.putShort(t.toShort); bb.putShort(size.toShort); bb.putShort(version.toShort)
    }
    bb.array()
  }

  def parseVlrPayload(bytes: Array[Byte]): LazVlr = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val compressor = bb.getShort(0) & 0xFFFF
    val coder = bb.getShort(2) & 0xFFFF
    require(coder == 0, s"unsupported LAZ coder $coder (only arithmetic=0)")
    val chunkSize = bb.getInt(12)
    val numItems = bb.getShort(32) & 0xFFFF
    val items = (0 until numItems).map { i =>
      val t = bb.getShort(34 + 6 * i) & 0xFFFF
      val version = bb.getShort(34 + 6 * i + 4) & 0xFFFF
      require(!ItemSpec.contains(t) || version == ItemSpec(t)._2,
        s"unsupported LAZ item version $version for item $t (only v2)")
      t
    }
    LazVlr(compressor, chunkSize, items)
  }

  // ---- raw (first-point) record codec --------------------------------

  private def writeRaw(bb: ByteBuffer, p: LazPoint, fmt: Int): Unit = {
    bb.putInt(p.x); bb.putInt(p.y); bb.putInt(p.z)
    bb.putShort(p.intensity.toShort)
    bb.put(p.flags.toByte)
    bb.put(p.classification.toByte)
    bb.put(p.scanAngleRank.toByte)
    bb.put(p.userData.toByte)
    bb.putShort(p.pointSourceId.toShort)
    if (LasFormat.hasGps(fmt)) bb.putLong(p.gpsTime)
    if (LasFormat.hasRgb(fmt)) {
      bb.putShort(p.red.toShort); bb.putShort(p.green.toShort); bb.putShort(p.blue.toShort)
    }
  }

  private def readRaw(bb: ByteBuffer, p: LazPoint, fmt: Int): Unit = {
    p.x = bb.getInt(); p.y = bb.getInt(); p.z = bb.getInt()
    p.intensity = bb.getShort() & 0xFFFF
    p.flags = bb.get() & 0xFF
    p.classification = bb.get() & 0xFF
    p.scanAngleRank = bb.get() & 0xFF
    p.userData = bb.get() & 0xFF
    p.pointSourceId = bb.getShort() & 0xFFFF
    if (LasFormat.hasGps(fmt)) p.gpsTime = bb.getLong()
    if (LasFormat.hasRgb(fmt)) {
      p.red = bb.getShort() & 0xFFFF
      p.green = bb.getShort() & 0xFFFF
      p.blue = bb.getShort() & 0xFFFF
    }
  }

  def recordLength(fmt: Int): Int = Seq(20, 28, 26, 34)(fmt)

  // ---- chunk codec ---------------------------------------------------

  /** Encode one chunk: raw first point + arithmetic-coded rest. */
  def encodeChunk(pts: IndexedSeq[LazPoint], fmt: Int): Array[Byte] = {
    require(pts.nonEmpty)
    val recLen = recordLength(fmt)
    val raw = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
    writeRaw(raw, pts.head, fmt)
    if (pts.size == 1) raw.array()
    else {
      val enc = new ArithmeticEncoder
      enc.init()
      val p10 = new Point10V2(enc, null, pts.head)
      val gps = if (LasFormat.hasGps(fmt)) new GpsTime11V2(enc, null, pts.head) else null
      val rgb = if (LasFormat.hasRgb(fmt)) new Rgb12V2(enc, null, pts.head) else null
      var i = 1
      while (i < pts.size) {
        val p = pts(i)
        p10.encode(p)
        if (gps != null) gps.encode(p.gpsTime)
        if (rgb != null) rgb.encode(p.red, p.green, p.blue)
        i += 1
      }
      raw.array() ++ enc.done()
    }
  }

  /** Streaming decoder over one chunk's byte slice. */
  final class ChunkDecoder(buf: Array[Byte], start: Int, end: Int, fmt: Int, count: Long) {
    val point = new LazPoint
    private var i = 0L
    private val recLen = recordLength(fmt)
    private var p10: Point10V2 = null
    private var gps: GpsTime11V2 = null
    private var rgb: Rgb12V2 = null
    private var dec: ArithmeticDecoder = null

    /** Advance to the next point (into [[point]]); false when exhausted. */
    def next(): Boolean = {
      if (i >= count) false
      else {
        if (i == 0) {
          val bb = ByteBuffer.wrap(buf, start, end - start).order(ByteOrder.LITTLE_ENDIAN)
          readRaw(bb, point, fmt)
          if (count > 1) {
            dec = new ArithmeticDecoder(buf, start + recLen, end)
            dec.init()
            p10 = new Point10V2(null, dec, point)
            gps = if (LasFormat.hasGps(fmt)) new GpsTime11V2(null, dec, point) else null
            rgb = if (LasFormat.hasRgb(fmt)) new Rgb12V2(null, dec, point) else null
          }
        } else {
          p10.decode(point)
          if (gps != null) point.gpsTime = gps.decode()
          if (rgb != null) rgb.decode(point)
        }
        i += 1
        true
      }
    }
  }

  // ---- chunk table ---------------------------------------------------

  /** One chunk's placement: byte span in the file + point span. */
  final case class LazChunk(fileOffset: Long, byteLen: Long, pointStart: Long, pointCount: Long)

  /** Chunk table: version, count, then per chunk the arithmetic-coded
    * byte size (context 1, previous size as the prediction) — preceded,
    * in variable-size chunking, by the chunk's point count (context 0,
    * previous count as the prediction), laszip's two-context scheme.
    * `chunkPointCounts` must be supplied iff the VLR declares variable
    * chunking. */
  def encodeChunkTable(chunkByteSizes: Seq[Long],
      chunkPointCounts: Option[Seq[Long]] = None): Array[Byte] = {
    require(chunkPointCounts.forall(_.size == chunkByteSizes.size),
      "chunk point-count list must align with the byte-size list")
    val sizes = chunkByteSizes.toIndexedSeq // O(1) access; a List would be O(n^2) below
    val counts = chunkPointCounts.map(_.toIndexedSeq)
    val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(0) // version
    head.putInt(sizes.size)
    if (sizes.isEmpty) head.array()
    else {
      val enc = new ArithmeticEncoder
      enc.init()
      val ic = new IntegerCompressor(enc, null, 32, 2)
      var prevSize = 0L
      var prevCount = 0L
      sizes.indices.foreach { i =>
        counts.foreach { cs =>
          ic.compress(prevCount.toInt, cs(i).toInt, 0)
          prevCount = cs(i)
        }
        ic.compress(prevSize.toInt, sizes(i).toInt, 1)
        prevSize = sizes(i)
      }
      head.array() ++ enc.done()
    }
  }

  /** Decode the chunk table to (pointCount, byteSize) pairs; for a
    * fixed-size table the counts come back as -1 (caller fills them from
    * the VLR chunk size). */
  def decodeChunkTable(buf: Array[Byte], start: Int, end: Int,
      variable: Boolean = false): Seq[(Long, Long)] = {
    val bb = ByteBuffer.wrap(buf, start, end - start).order(ByteOrder.LITTLE_ENDIAN)
    val version = bb.getInt()
    require(version == 0, s"unsupported LAZ chunk table version $version")
    val n = bb.getInt()
    if (n == 0) Nil
    else {
      val dec = new ArithmeticDecoder(buf, start + 8, end)
      dec.init()
      val ic = new IntegerCompressor(null, dec, 32, 2)
      val out = new Array[(Long, Long)](n)
      var prevSize = 0L
      var prevCount = 0L
      var i = 0
      while (i < n) {
        val count =
          if (!variable) -1L
          else {
            prevCount = ic.decompress(prevCount.toInt, 0).toLong & 0xFFFFFFFFL
            prevCount
          }
        prevSize = ic.decompress(prevSize.toInt, 1).toLong & 0xFFFFFFFFL
        out(i) = (count, prevSize)
        i += 1
      }
      out.toSeq
    }
  }

  /** Driver-side chunk placement for a LAZ file: reads the i64 table
    * pointer at the point-data offset, decodes the table, and lays the
    * chunks out (chunk 0 starts right after the pointer). */
  def readChunks(conf: Configuration, path: String, header: LasFormat.LasHeader): Seq[LazChunk] = {
    val vlr = header.laz.getOrElse(
      throw new IllegalArgumentException(s"$path is not a LAZ file"))
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val ptr = new Array[Byte](8)
      in.readFully(header.pointOffset, ptr)
      val tableOffset = ByteBuffer.wrap(ptr).order(ByteOrder.LITTLE_ENDIAN).getLong
      require(tableOffset > 0 && tableOffset <= fileLen - 8,
        s"$path: bad LAZ chunk table offset $tableOffset")
      val tableLen = (fileLen - tableOffset).toInt
      val table = new Array[Byte](tableLen)
      in.readFully(tableOffset, table)
      val entries = decodeChunkTable(table, 0, tableLen, vlr.variable)
      // fixed mode derives the last chunk's count by subtraction, which
      // would make a sum check tautological — validate the entry COUNT
      // instead (every chunk but the last holds exactly chunkSize points)
      if (!vlr.variable) {
        val expected =
          ((header.pointCount + vlr.chunkSize - 1) / vlr.chunkSize).toInt
        require(entries.size == expected,
          s"$path: ${entries.size} chunk table entries for " +
            s"${header.pointCount} points at chunk size ${vlr.chunkSize} " +
            s"(expected $expected)")
      }
      var off = header.pointOffset + 8
      var pointStart = 0L
      val chunks = entries.zipWithIndex.map { case ((tableCount, byteLen), i) =>
        val count =
          if (vlr.variable) tableCount
          else if (i < entries.size - 1) vlr.chunkSize.toLong
          else header.pointCount - pointStart
        val c = LazChunk(off, byteLen, pointStart, count)
        off += byteLen
        pointStart += count
        c
      }
      require(pointStart == header.pointCount,
        s"$path: chunk table covers $pointStart points, header says ${header.pointCount}")
      chunks
    } finally in.close()
  }

  // ---- whole-file writer (fixtures / export) -------------------------

  /** Write a LAZ file (point formats 0-3), mirroring
    * [[LasFormat.write]]'s header/quantization so a LAS and a LAZ of the
    * same points resolve identically. */
  def write(conf: Configuration, path: String, points: Seq[LasPoint],
      pointFormat: Int = 1,
      scale: (Double, Double, Double) = (0.001, 0.001, 0.001),
      offset: (Double, Double, Double) = (0.0, 0.0, 0.0),
      chunkSize: Int = DefaultChunkSize,
      variableChunks: Option[Seq[Int]] = None): Unit = {
    require(pointFormat <= 3)
    require(chunkSize > 0)
    variableChunks.foreach { cs =>
      require(cs.forall(_ > 0) && cs.sum == points.size,
        s"variable chunk counts must be positive and sum to ${points.size}")
    }
    val payload = vlrPayload(pointFormat,
      if (variableChunks.isDefined) VariableChunkSize else chunkSize)
    val pointOffset = LasFormat.HeaderSize + 54 + payload.length

    val header = ByteBuffer.allocate(LasFormat.HeaderSize).order(ByteOrder.LITTLE_ENDIAN)
    header.put(LasFormat.Signature.getBytes("US-ASCII"))
    header.put(24, 1.toByte) // version major
    header.put(25, 2.toByte) // version minor
    header.putShort(94, LasFormat.HeaderSize.toShort)
    header.putInt(96, pointOffset)
    header.putInt(100, 1) // one VLR: laszip
    header.put(104, (pointFormat | 0x80).toByte)
    header.putShort(105, recordLength(pointFormat).toShort)
    header.putInt(107, points.size)
    header.putDouble(131, scale._1); header.putDouble(139, scale._2)
    header.putDouble(147, scale._3)
    header.putDouble(155, offset._1); header.putDouble(163, offset._2)
    header.putDouble(171, offset._3)
    def res(v: Double, s: Double, o: Double) = Math.round((v - o) / s).toInt * s + o
    val xs = points.map(p0 => res(p0.x, scale._1, offset._1))
    val ys = points.map(p0 => res(p0.y, scale._2, offset._2))
    val zs = points.map(p0 => res(p0.z, scale._3, offset._3))
    header.putDouble(179, if (xs.isEmpty) 0 else xs.max)
    header.putDouble(187, if (xs.isEmpty) 0 else xs.min)
    header.putDouble(195, if (ys.isEmpty) 0 else ys.max)
    header.putDouble(203, if (ys.isEmpty) 0 else ys.min)
    header.putDouble(211, if (zs.isEmpty) 0 else zs.max)
    header.putDouble(219, if (zs.isEmpty) 0 else zs.min)

    val vlrHead = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    vlrHead.putShort(0, 0) // reserved
    val uid = LaszipUserId.getBytes("US-ASCII")
    vlrHead.position(2); vlrHead.put(uid); vlrHead.position(0)
    vlrHead.putShort(18, LaszipRecordId.toShort)
    vlrHead.putShort(20, payload.length.toShort)

    // quantize to raw records
    val lazPts = points.map { pt =>
      val lp = new LazPoint
      lp.x = Math.round((pt.x - offset._1) / scale._1).toInt
      lp.y = Math.round((pt.y - offset._2) / scale._2).toInt
      lp.z = Math.round((pt.z - offset._3) / scale._3).toInt
      lp.intensity = pt.intensity & 0xFFFF
      lp.flags = (pt.returnNumber & 0x07) | ((pt.numberOfReturns & 0x07) << 3) |
        ((pt.scanDirection & 0x01) << 6) | ((if (pt.edge) 1 else 0) << 7)
      lp.classification = pt.classification & 0xFF
      lp.scanAngleRank = pt.scanAngleRank & 0xFF
      lp.userData = pt.userData & 0xFF
      lp.pointSourceId = pt.pointSourceId & 0xFFFF
      lp.gpsTime = java.lang.Double.doubleToRawLongBits(pt.gpsTime)
      lp.red = pt.red & 0xFFFF; lp.green = pt.green & 0xFFFF; lp.blue = pt.blue & 0xFFFF
      lp
    }.toIndexedSeq

    val body = new ByteArrayOutputStream()
    body.write(header.array())
    body.write(vlrHead.array())
    body.write(payload)
    val ptrPos = body.size()
    body.write(new Array[Byte](8)) // chunk table pointer, patched below
    val groups: Iterator[IndexedSeq[LazPoint]] = variableChunks match {
      case None => lazPts.grouped(chunkSize)
      case Some(cs) =>
        val bounds = cs.scanLeft(0)(_ + _)
        bounds.init.zip(bounds.tail).iterator.map { case (a, b) => lazPts.slice(a, b) }
    }
    val chunkSizes = groups.map { group =>
      val bytes = encodeChunk(group, pointFormat)
      body.write(bytes)
      bytes.length.toLong
    }.toSeq
    val tableOffset = body.size().toLong
    body.write(encodeChunkTable(chunkSizes,
      variableChunks.map(_.map(_.toLong))))

    val all = body.toByteArray
    ByteBuffer.wrap(all, ptrPos, 8).order(ByteOrder.LITTLE_ENDIAN).putLong(tableOffset)

    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(all) finally out.close()
  }
}
