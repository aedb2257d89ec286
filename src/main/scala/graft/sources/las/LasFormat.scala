package graft.sources.las

import java.io.{DataOutputStream, OutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import graft.pc.PcSchema

/** LAS 1.2/1.4 binary format: header codec, point-record codec, and a
  * small writer for fixtures/export (reference reads LAS/LAZ via an
  * external crate — pc-io/src/las/source.rs:50-138; the byte layout here
  * follows the public ASPRS LAS 1.2 and 1.4 specifications).
  *
  * Supported point formats: legacy 0 (20 bytes), 1 (format 0 + gps_time
  * f64), 2 (format 0 + RGB u16×3), 3 (format 1 + RGB u16×3); and the
  * LAS 1.4 extended records 6 (30 bytes: 4-bit return fields, scanner
  * channel, i16 scan angle, mandatory gps_time), 7 (format 6 + RGB) and
  * 8 (format 7 + NIR). Formats 9/10 (waveform packets) are rejected with
  * a clear error — same practical scope as the reference's usage.
  * Coordinates resolve as `raw_i32 * scale + offset`; the resolved schema
  * mirrors the reference's `schema_from_header` mapping with unsigned
  * widening (FIXTURES.md §1): intensity/point_source_id/colors/nir
  * u16→Int, u8→Short.
  */
object LasFormat {

  val HeaderSize: Int = 227
  /** LAS 1.4 header size (adds waveform/EVLR pointers + 64-bit counts). */
  val HeaderSize14: Int = 375
  val Signature = "LASF"

  final case class LasHeader(
      pointFormat: Int,
      recordLength: Int,
      pointCount: Long,
      pointOffset: Long,
      scale: (Double, Double, Double),
      offset: (Double, Double, Double),
      // LAS headers store max before min, per axis
      min: (Double, Double, Double),
      max: (Double, Double, Double),
      /** Present iff the file is LAZ (compressed point records). */
      laz: Option[graft.sources.las.laz.LazFormat.LazVlr] = None) {
    def bounds: Map[String, (Double, Double)] = Map(
      "x" -> (min._1, max._1), "y" -> (min._2, max._2), "z" -> (min._3, max._3))
    /** Length of the record's user-defined extra-bytes tail — the single
      * definition every consumer (planner, VLR validation, row decoder)
      * derives it from. */
    def extraBytes: Int = recordLength - recordLengthFor(pointFormat)
  }

  def readHeader(conf: Configuration, path: String): LasHeader = {
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    try {
      val small = new Array[Byte](HeaderSize)
      in.readFully(0L, small)
      val sig = new String(small, 0, 4, "US-ASCII")
      require(sig == Signature, s"$path is not a LAS file (signature `$sig`)")
      // re-read at the declared header size: LAS 1.4 headers are 375
      // bytes and carry the 64-bit point count past offset 227
      val declared = ByteBuffer.wrap(small).order(ByteOrder.LITTLE_ENDIAN)
        .getShort(94) & 0xffff
      val buf =
        if (declared <= HeaderSize) small
        else { val b = new Array[Byte](declared); in.readFully(0L, b); b }
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      val fmt = bb.get(104) & 0x7f
      require(fmt <= 3 || (fmt >= 6 && fmt <= 8),
        s"unsupported LAS point format $fmt (only 0-3 and 6-8)")
      val compressed = (bb.get(104) & 0x80) != 0
      val pointOffset = bb.getInt(96).toLong & 0xffffffffL
      val laz =
        if (!compressed) None
        else {
          // walk the VLRs between header and point data for the laszip
          // record (user id `laszip encoded`, record id 22204)
          val headerSize = bb.getShort(94) & 0xffff
          val vlrCount = bb.getInt(100)
          val region = new Array[Byte]((pointOffset - headerSize).toInt)
          in.readFully(headerSize.toLong, region)
          val rb = ByteBuffer.wrap(region).order(ByteOrder.LITTLE_ENDIAN)
          var pos = 0
          var found: Option[graft.sources.las.laz.LazFormat.LazVlr] = None
          var i = 0
          while (i < vlrCount && found.isEmpty && pos + 54 <= region.length) {
            val userId = new String(region, pos + 2, 16, "US-ASCII").takeWhile(_ != 0)
            val recordId = rb.getShort(pos + 18) & 0xffff
            val len = rb.getShort(pos + 20) & 0xffff
            if (userId == graft.sources.las.laz.LazFormat.LaszipUserId &&
                recordId == graft.sources.las.laz.LazFormat.LaszipRecordId) {
              val payload = java.util.Arrays.copyOfRange(region, pos + 54, pos + 54 + len)
              found = Some(graft.sources.las.laz.LazFormat.parseVlrPayload(payload))
            }
            pos += 54 + len
            i += 1
          }
          Some(found.getOrElse(throw new IllegalArgumentException(
            s"$path has the LAZ compressed bit but no laszip VLR")))
        }
      // LAS 1.4 stores the real count as u64 at 247 (the legacy u32 at
      // 107 is zero for extended formats); prefer it when present
      val legacyCount = bb.getInt(107).toLong & 0xffffffffL
      val count =
        if (buf.length >= HeaderSize14 && bb.getLong(247) > 0) bb.getLong(247)
        else legacyCount
      val recLen = bb.getShort(105) & 0xffff
      require(recLen >= recordLengthFor(fmt),
        s"$path: record length $recLen below format $fmt's ${recordLengthFor(fmt)}")
      LasHeader(
        pointFormat = fmt,
        recordLength = recLen,
        pointCount = count,
        pointOffset = pointOffset,
        scale = (bb.getDouble(131), bb.getDouble(139), bb.getDouble(147)),
        offset = (bb.getDouble(155), bb.getDouble(163), bb.getDouble(171)),
        min = (bb.getDouble(187), bb.getDouble(203), bb.getDouble(219)),
        max = (bb.getDouble(179), bb.getDouble(195), bb.getDouble(211)),
        laz = laz)
    } finally in.close()
  }

  /** Resolved-coordinate schema for a point format (reference:
    * pc-io/src/las/schema.rs:38-84, with Spark unsigned widening).
    * `extraBytes > 0` (record length beyond the standard format length)
    * appends an opaque `extra_bytes` binary column — user-defined
    * per-point attributes, common in production tiles. */
  def schemaFor(pointFormat: Int, extraBytes: Int = 0): StructType = {
    val base = Seq(
      PcSchema.dimensionField("x", DoubleType, 1, location = true),
      PcSchema.dimensionField("y", DoubleType, 2, location = true),
      PcSchema.dimensionField("z", DoubleType, 3, location = true),
      StructField("intensity", IntegerType, nullable = false),
      StructField("return_number", ShortType, nullable = false),
      StructField("number_of_returns", ShortType, nullable = false),
      StructField("scan_direction", ShortType, nullable = false),
      StructField("is_edge_of_flight_line", BooleanType, nullable = false),
      // classification flags, uniform across formats like the reference
      // (legacy: classification-byte bits 5-7, no overlap flag; extended:
      // the flags nibble) — schema_from_header exposes the same four
      StructField("is_synthetic", BooleanType, nullable = false),
      StructField("is_key_point", BooleanType, nullable = false),
      StructField("is_withheld", BooleanType, nullable = false),
      StructField("is_overlap", BooleanType, nullable = false),
      StructField("classification", ShortType, nullable = false),
      StructField("scan_angle_rank", ShortType, nullable = false),
      // reference exposes degrees as f32 (las crate semantics: legacy
      // rank is whole degrees, extended units are 0.006 deg); the raw
      // scan_angle_rank column above is kept as the lossless twin
      StructField("scan_angle", FloatType, nullable = false),
      StructField("user_data", ShortType, nullable = false),
      StructField("point_source_id", IntegerType, nullable = false))
    val withChannel =
      if (isExtended(pointFormat))
        base :+ StructField("scanner_channel", ShortType, nullable = false)
      else base
    val withGps =
      if (hasGps(pointFormat)) withChannel :+ StructField("gps_time", DoubleType, nullable = false)
      else withChannel
    val withRgb =
      if (hasRgb(pointFormat)) withGps ++ Seq(
        StructField("red", IntegerType, nullable = false),
        StructField("green", IntegerType, nullable = false),
        StructField("blue", IntegerType, nullable = false))
      else withGps
    val withNir =
      if (hasNir(pointFormat)) withRgb :+ StructField("nir", IntegerType, nullable = false)
      else withRgb
    val withExtra =
      if (extraBytes > 0)
        withNir :+ StructField("extra_bytes", BinaryType, nullable = false)
      else withNir
    StructType(withExtra)
  }

  /** LAS 1.4 extended records (4-bit returns, scanner channel, i16 scan
    * angle, mandatory gps). */
  def isExtended(pointFormat: Int): Boolean = pointFormat >= 6
  def hasGps(pointFormat: Int): Boolean =
    pointFormat == 1 || pointFormat == 3 || isExtended(pointFormat)
  def hasRgb(pointFormat: Int): Boolean =
    pointFormat == 2 || pointFormat == 3 || pointFormat == 7 || pointFormat == 8
  def hasNir(pointFormat: Int): Boolean = pointFormat == 8

  /** Widest schema every input format can serve (generalizes the old
    * "lowest format wins" rule, which relied on format 0 being a prefix
    * of format 1 — not true once RGB formats join the mix). The
    * `extra_bytes` column appears only when EVERY file carries extra
    * bytes (payload lengths may differ per file — it's binary). */
  def commonSchema(formats: Seq[Int], extras: Seq[Int] = Nil): StructType = {
    require(formats.nonEmpty)
    val extra = if (extras.nonEmpty && extras.forall(_ > 0)) 1 else 0
    if (formats.forall(_ == formats.head)) schemaFor(formats.head, extra)
    else {
      // the representative format providing exactly the shared features;
      // nir-only mixes can't arise (nir => format 8, caught by all-equal)
      val gps = formats.forall(hasGps)
      val rgb = formats.forall(hasRgb)
      val ext = formats.forall(isExtended) // implies gps
      schemaFor((ext, gps, rgb) match {
        case (true, _, true) => 7
        case (true, _, false) => 6
        case (false, true, true) => 3
        case (false, true, false) => 1
        case (false, false, true) => 2
        case (false, false, false) => 0
      }, extra)
    }
  }

  /** Format-independent semantic field codes: decode switches on these
    * (plus the record's own point format for byte offsets), so a reader
    * can serve any projection of [[commonSchema]] from any file format. */
  val FieldNames: Seq[String] = Seq(
    "x", "y", "z", "intensity", "return_number", "number_of_returns",
    "scan_direction", "is_edge_of_flight_line", "classification",
    "scan_angle_rank", "user_data", "point_source_id", "gps_time",
    "red", "green", "blue", "scanner_channel", "nir",
    "is_synthetic", "is_key_point", "is_withheld", "is_overlap", "scan_angle",
    "extra_bytes")

  def fieldCode(name: String): Int = {
    val c = FieldNames.indexOf(name)
    require(c >= 0, s"unknown LAS field `$name`")
    c
  }

  /** Decode one point record into `out(i) = value of fieldCodes(i)`,
    * where fieldCodes are [[fieldCode]] values; byte offsets of gps/rgb
    * depend on the record's point format. */
  def decode(bb: ByteBuffer, recordStart: Int, h: LasHeader,
      fieldCodes: Array[Int], out: Array[Any]): Unit = {
    val ext = isExtended(h.pointFormat)
    val rgbBase = recordStart +
      (if (ext) 30 else if (h.pointFormat == 3) 28 else 20)
    var i = 0
    while (i < fieldCodes.length) {
      out(i) = fieldCodes(i) match {
        case 0 => bb.getInt(recordStart) * h.scale._1 + h.offset._1
        case 1 => bb.getInt(recordStart + 4) * h.scale._2 + h.offset._2
        case 2 => bb.getInt(recordStart + 8) * h.scale._3 + h.offset._3
        case 3 => bb.getShort(recordStart + 12) & 0xffff
        case 4 =>
          if (ext) (bb.get(recordStart + 14) & 0x0f).toShort
          else (bb.get(recordStart + 14) & 0x07).toShort
        case 5 =>
          if (ext) ((bb.get(recordStart + 14) >> 4) & 0x0f).toShort
          else ((bb.get(recordStart + 14) >> 3) & 0x07).toShort
        case 6 =>
          if (ext) ((bb.get(recordStart + 15) >> 6) & 0x01).toShort
          else ((bb.get(recordStart + 14) >> 6) & 0x01).toShort
        case 7 =>
          if (ext) ((bb.get(recordStart + 15) >> 7) & 0x01) == 1
          else ((bb.get(recordStart + 14) >> 7) & 0x01) == 1
        case 8 => // legacy strips the flag bits like the reference's reader
          if (ext) (bb.get(recordStart + 16) & 0xff).toShort
          else (bb.get(recordStart + 15) & 0x1f).toShort
        case 9 => // i8 "rank" (legacy) vs i16 0.006-degree units (extended)
          if (ext) bb.getShort(recordStart + 18)
          else bb.get(recordStart + 16).toShort
        case 10 => (bb.get(recordStart + 17) & 0xff).toShort
        case 11 =>
          if (ext) bb.getShort(recordStart + 20) & 0xffff
          else bb.getShort(recordStart + 18) & 0xffff
        case 12 =>
          bb.getDouble(recordStart + (if (ext) 22 else 20))
        case 13 => bb.getShort(rgbBase) & 0xffff
        case 14 => bb.getShort(rgbBase + 2) & 0xffff
        case 15 => bb.getShort(rgbBase + 4) & 0xffff
        case 16 => ((bb.get(recordStart + 15) >> 4) & 0x03).toShort
        case 17 => bb.getShort(rgbBase + 6) & 0xffff
        case 18 => // is_synthetic: flags nibble (ext) / classification bit 5
          if (ext) (bb.get(recordStart + 15) & 0x01) == 1
          else ((bb.get(recordStart + 15) >> 5) & 0x01) == 1
        case 19 => // is_key_point
          if (ext) ((bb.get(recordStart + 15) >> 1) & 0x01) == 1
          else ((bb.get(recordStart + 15) >> 6) & 0x01) == 1
        case 20 => // is_withheld
          if (ext) ((bb.get(recordStart + 15) >> 2) & 0x01) == 1
          else ((bb.get(recordStart + 15) >> 7) & 0x01) == 1
        case 21 => // is_overlap: extended-only flag, false on legacy
          if (ext) ((bb.get(recordStart + 15) >> 3) & 0x01) == 1
          else false
        case 22 => // degrees as f32: legacy rank = whole degrees, ext 0.006°
          if (ext) bb.getShort(recordStart + 18) * 0.006f
          else bb.get(recordStart + 16).toFloat
        case 23 => // opaque extra-bytes tail of the record (bulk copy)
          val tailStart = recordStart + h.recordLength - h.extraBytes
          java.util.Arrays.copyOfRange(bb.array(),
            bb.arrayOffset() + tailStart, bb.arrayOffset() + tailStart + h.extraBytes)
      }
      i += 1
    }
  }

  /** One LAS point for the fixture writer. `overlap` only exists in the
    * extended (1.4) records; the legacy writer ignores it. */
  final case class LasPoint(
      x: Double, y: Double, z: Double,
      intensity: Int = 0, returnNumber: Int = 1, numberOfReturns: Int = 1,
      scanDirection: Int = 0, edge: Boolean = false, classification: Int = 0,
      scanAngleRank: Int = 0, userData: Int = 0, pointSourceId: Int = 0,
      gpsTime: Double = 0.0, red: Int = 0, green: Int = 0, blue: Int = 0,
      scannerChannel: Int = 0, nir: Int = 0,
      synthetic: Boolean = false, keyPoint: Boolean = false,
      withheld: Boolean = false, overlap: Boolean = false,
      extra: Array[Byte] = Array.emptyByteArray) {
    /** The extended flags nibble (byte 15 bits 0-3). */
    def flagsNibble: Int = (if (synthetic) 1 else 0) | (if (keyPoint) 2 else 0) |
      (if (withheld) 4 else 0) | (if (overlap) 8 else 0)
    /** The legacy classification byte: 5-bit class + 3 flag bits. */
    def legacyClassByte: Int = (classification & 0x1f) |
      (if (synthetic) 0x20 else 0) | (if (keyPoint) 0x40 else 0) |
      (if (withheld) 0x80 else 0)
  }

  /** Point record length by format. */
  def recordLengthFor(pointFormat: Int): Int = pointFormat match {
    case 0 => 20; case 1 => 28; case 2 => 26; case 3 => 34
    case 6 => 30; case 7 => 36; case 8 => 38
    case f => throw new IllegalArgumentException(s"unsupported point format $f")
  }

  /** Write a LAS file: 1.2 for point formats 0-3, 1.4 for 6-8 (375-byte
    * header, 64-bit point count, legacy count zeroed per spec). */
  def write(conf: Configuration, path: String, points: Seq[LasPoint],
      pointFormat: Int = 1,
      scale: (Double, Double, Double) = (0.001, 0.001, 0.001),
      offset: (Double, Double, Double) = (0.0, 0.0, 0.0),
      extraBytes: Int = 0): Unit = {
    require(points.forall(_.extra.length == extraBytes),
      s"every point's extra payload must be exactly $extraBytes bytes")
    val ext = isExtended(pointFormat)
    val recLen = recordLengthFor(pointFormat) + extraBytes
    val hdrLen = if (ext) HeaderSize14 else HeaderSize
    val p = new Path(path)
    val out: OutputStream = p.getFileSystem(conf).create(p, true)
    try {
      val header = ByteBuffer.allocate(hdrLen).order(ByteOrder.LITTLE_ENDIAN)
      header.put(Signature.getBytes("US-ASCII"))
      header.put(24, 1.toByte) // version major
      header.put(25, (if (ext) 4 else 2).toByte) // version minor
      header.putShort(94, hdrLen.toShort)
      header.putInt(96, hdrLen) // point data offset (no VLRs)
      header.put(104, pointFormat.toByte)
      header.putShort(105, recLen.toShort)
      if (ext) header.putLong(247, points.size.toLong) // legacy u32 stays 0
      else header.putInt(107, points.size)
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
      out.write(header.array())
      val rec = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
      points.foreach { pt =>
        rec.clear()
        rec.putInt(Math.round((pt.x - offset._1) / scale._1).toInt)
        rec.putInt(Math.round((pt.y - offset._2) / scale._2).toInt)
        rec.putInt(Math.round((pt.z - offset._3) / scale._3).toInt)
        rec.putShort((pt.intensity & 0xffff).toShort)
        if (ext) {
          rec.put(((pt.returnNumber & 0x0f) | ((pt.numberOfReturns & 0x0f) << 4)).toByte)
          rec.put((pt.flagsNibble | ((pt.scannerChannel & 0x03) << 4) |
            ((pt.scanDirection & 0x01) << 6) | ((if (pt.edge) 1 else 0) << 7)).toByte)
          rec.put((pt.classification & 0xff).toByte)
          rec.put((pt.userData & 0xff).toByte)
          rec.putShort(pt.scanAngleRank.toShort) // i16 0.006-degree units
          rec.putShort((pt.pointSourceId & 0xffff).toShort)
          rec.putDouble(pt.gpsTime)
        } else {
          val flags = (pt.returnNumber & 0x07) | ((pt.numberOfReturns & 0x07) << 3) |
            ((pt.scanDirection & 0x01) << 6) | ((if (pt.edge) 1 else 0) << 7)
          rec.put(flags.toByte)
          rec.put(pt.legacyClassByte.toByte)
          rec.put(pt.scanAngleRank.toByte)
          rec.put((pt.userData & 0xff).toByte)
          rec.putShort((pt.pointSourceId & 0xffff).toShort)
          if (hasGps(pointFormat)) rec.putDouble(pt.gpsTime)
        }
        if (hasRgb(pointFormat)) {
          rec.putShort((pt.red & 0xffff).toShort)
          rec.putShort((pt.green & 0xffff).toShort)
          rec.putShort((pt.blue & 0xffff).toShort)
        }
        if (hasNir(pointFormat)) rec.putShort((pt.nir & 0xffff).toShort)
        if (extraBytes > 0) rec.put(pt.extra)
        out.write(rec.array(), 0, recLen)
      }
    } finally out.close()
  }
}
