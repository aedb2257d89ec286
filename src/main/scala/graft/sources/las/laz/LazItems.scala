package graft.sources.las.laz

/** Mutable decoded point record shared by the LAZ item codecs. Field
  * domains are the raw LAS 1.2 record fields: x/y/z scaled i32, u16
  * intensity/pointSourceId/colors, the packed flags byte (return number,
  * number of returns, scan direction, edge), u8 classification /
  * scanAngleRank (raw byte; sign belongs to the LAS layer) / userData,
  * gpsTime as raw f64 bits.
  *
  * LAS 1.4 extended records (formats 6-8) use `returns` (4-bit return
  * number | 4-bit number of returns << 4), `extFlags` (classification
  * flags nibble | scanner channel << 4 | scan direction << 6 |
  * edge << 7), i16 `scanAngle` and u16 `nir` instead of `flags` /
  * `scanAngleRank`. */
final class LazPoint {
  var x = 0
  var y = 0
  var z = 0
  var intensity = 0
  var flags = 0
  var classification = 0
  var scanAngleRank = 0
  var userData = 0
  var pointSourceId = 0
  var gpsTime = 0L
  var red = 0
  var green = 0
  var blue = 0
  // extended (formats 6-8) fields
  var returns = 0
  var extFlags = 0
  var scanAngle = 0
  var nir = 0
  /** Opaque extra-bytes tail (record length beyond the standard format
    * length); empty when the file has none. */
  var extra: Array[Byte] = Array.emptyByteArray

  def copyFrom(o: LazPoint): Unit = {
    x = o.x; y = o.y; z = o.z
    intensity = o.intensity; flags = o.flags
    classification = o.classification; scanAngleRank = o.scanAngleRank
    userData = o.userData; pointSourceId = o.pointSourceId
    gpsTime = o.gpsTime
    red = o.red; green = o.green; blue = o.blue
    returns = o.returns; extFlags = o.extFlags
    scanAngle = o.scanAngle; nir = o.nir
    // share the reference: extra arrays are never mutated in place (the
    // codecs keep their own cloned state and hand out fresh arrays), and
    // a per-point clone here would sit on the hot decode loop
    extra = o.extra
  }
}

private[laz] object LazUtil {
  /** Wrap an i32 in [-256, 511] back into the u8 byte ring. */
  def u8Fold(n: Int): Int = n & 0xFF
  def u8Clamp(n: Int): Int = if (n < 0) 0 else if (n > 255) 255 else n

  /** Context tables of the POINT10 coder: a (number_of_returns,
    * return_number) pair maps to one of 16 streaming-median/intensity
    * contexts and one of 8 height contexts (levels = |n - r| bands). */
  val NumberReturnMap: Array[Array[Int]] = Array(
    Array(15, 14, 13, 12, 11, 10, 9, 8),
    Array(14, 0, 1, 3, 6, 10, 10, 9),
    Array(13, 1, 2, 4, 7, 11, 11, 10),
    Array(12, 3, 4, 5, 8, 12, 12, 11),
    Array(11, 6, 7, 8, 9, 13, 13, 12),
    Array(10, 10, 11, 12, 13, 14, 14, 13),
    Array(9, 10, 11, 12, 13, 14, 15, 14),
    Array(8, 9, 10, 11, 12, 13, 14, 15))
  val NumberReturnLevel: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7),
    Array(1, 0, 1, 2, 3, 4, 5, 6),
    Array(2, 1, 0, 1, 2, 3, 4, 5),
    Array(3, 2, 1, 0, 1, 2, 3, 4),
    Array(4, 3, 2, 1, 0, 1, 2, 3),
    Array(5, 4, 3, 2, 1, 0, 1, 2),
    Array(6, 5, 4, 3, 2, 1, 0, 1),
    Array(7, 6, 5, 4, 3, 2, 1, 0))
}

/** Running median-of-5 of coordinate deltas — the POINT10 coordinate
  * predictor. The partial-sort insertion scheme alternates an upward and
  * a downward pass so a fresh value can displace the median from either
  * side (the published streaming-median structure of the LASzip coder). */
final class StreamingMedian5 {
  private val v = new Array[Int](5)
  private var high = true

  def add(x: Int): Unit = {
    if (high) {
      if (x < v(2)) {
        v(4) = v(3); v(3) = v(2)
        if (x < v(0)) { v(2) = v(1); v(1) = v(0); v(0) = x }
        else if (x < v(1)) { v(2) = v(1); v(1) = x }
        else v(2) = x
      } else {
        if (x < v(3)) { v(4) = v(3); v(3) = x }
        else v(4) = x
        high = false
      }
    } else {
      if (v(2) < x) {
        v(0) = v(1); v(1) = v(2)
        if (v(4) < x) { v(2) = v(3); v(3) = v(4); v(4) = x }
        else if (v(3) < x) { v(2) = v(3); v(3) = x }
        else v(2) = x
      } else {
        if (v(1) < x) { v(0) = v(1); v(1) = x }
        else v(0) = x
        high = true
      }
    }
  }

  def get: Int = v(2)
}

/** POINT10 item codec (v2 layout): change-flag symbol, per-context
  * models for the packed byte / classification / user data keyed by
  * their previous value, intensity + point-source correctors, and
  * median-predicted x/y deltas whose corrector interval index feeds the
  * y and z contexts. One instance per chunk per direction; `first` is
  * the chunk's raw-stored first point. */
final class Point10V2(enc: ArithmeticEncoder, dec: ArithmeticDecoder, first: LazPoint) {
  import LazUtil._
  private val forDecoder = dec != null

  private val mChangedValues = new ArithmeticModel(64, forDecoder)
  private val mBitByte = new Array[ArithmeticModel](256)
  private val mClassification = new Array[ArithmeticModel](256)
  private val mUserData = new Array[ArithmeticModel](256)
  private val mScanAngleRank =
    Array(new ArithmeticModel(256, forDecoder), new ArithmeticModel(256, forDecoder))
  private val icIntensity = new IntegerCompressor(enc, dec, 16, 4)
  private val icPointSource = new IntegerCompressor(enc, dec, 16, 1)
  private val icDx = new IntegerCompressor(enc, dec, 32, 2)
  private val icDy = new IntegerCompressor(enc, dec, 32, 22)
  private val icZ = new IntegerCompressor(enc, dec, 32, 20)

  private val lastXDiff = Array.fill(16)(new StreamingMedian5)
  private val lastYDiff = Array.fill(16)(new StreamingMedian5)
  private val lastIntensity = new Array[Int](16)
  private val lastHeight = new Array[Int](8)
  private val last = new LazPoint
  last.copyFrom(first)

  private def lazyModel(arr: Array[ArithmeticModel], ctx: Int): ArithmeticModel = {
    if (arr(ctx) == null) arr(ctx) = new ArithmeticModel(256, forDecoder)
    arr(ctx)
  }

  def encode(cur: LazPoint): Unit = {
    val n = (cur.flags >>> 3) & 7
    val r = cur.flags & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)

    val changed =
      (if (last.flags != cur.flags) 32 else 0) |
        (if (lastIntensity(m) != cur.intensity) 16 else 0) |
        (if (last.classification != cur.classification) 8 else 0) |
        (if (last.scanAngleRank != cur.scanAngleRank) 4 else 0) |
        (if (last.userData != cur.userData) 2 else 0) |
        (if (last.pointSourceId != cur.pointSourceId) 1 else 0)
    enc.encodeSymbol(mChangedValues, changed)
    if (changed != 0) {
      if ((changed & 32) != 0)
        enc.encodeSymbol(lazyModel(mBitByte, last.flags), cur.flags)
      if ((changed & 16) != 0) {
        icIntensity.compress(lastIntensity(m), cur.intensity, if (m < 3) m else 3)
        lastIntensity(m) = cur.intensity
      }
      if ((changed & 8) != 0)
        enc.encodeSymbol(lazyModel(mClassification, last.classification), cur.classification)
      if ((changed & 4) != 0)
        enc.encodeSymbol(mScanAngleRank((cur.flags >>> 6) & 1),
          u8Fold(cur.scanAngleRank - last.scanAngleRank))
      if ((changed & 2) != 0)
        enc.encodeSymbol(lazyModel(mUserData, last.userData), cur.userData)
      if ((changed & 1) != 0)
        icPointSource.compress(last.pointSourceId, cur.pointSourceId)
    }

    val nCtx = if (n == 1) 1 else 0
    var diff = cur.x - last.x
    icDx.compress(lastXDiff(m).get, diff, nCtx)
    lastXDiff(m).add(diff)

    var kBits = icDx.k
    diff = cur.y - last.y
    icDy.compress(lastYDiff(m).get, diff,
      nCtx + (if (kBits < 20) kBits & 0xFE else 20))
    lastYDiff(m).add(diff)

    kBits = (icDx.k + icDy.k) / 2
    icZ.compress(lastHeight(l), cur.z,
      nCtx + (if (kBits < 18) kBits & 0xFE else 18))
    lastHeight(l) = cur.z

    last.copyFrom(cur)
  }

  def decode(out: LazPoint): Unit = {
    val changed = dec.decodeSymbol(mChangedValues)
    if ((changed & 32) != 0)
      last.flags = dec.decodeSymbol(lazyModel(mBitByte, last.flags))

    val n = (last.flags >>> 3) & 7
    val r = last.flags & 7
    val m = NumberReturnMap(n)(r)
    val l = NumberReturnLevel(n)(r)

    if ((changed & 16) != 0) {
      last.intensity = icIntensity.decompress(lastIntensity(m), if (m < 3) m else 3)
      lastIntensity(m) = last.intensity
    } else last.intensity = lastIntensity(m)
    if ((changed & 8) != 0) {
      val old = last.classification
      last.classification = dec.decodeSymbol(lazyModel(mClassification, old))
    }
    if ((changed & 4) != 0)
      last.scanAngleRank = u8Fold(
        dec.decodeSymbol(mScanAngleRank((last.flags >>> 6) & 1)) + last.scanAngleRank)
    if ((changed & 2) != 0) {
      val old = last.userData
      last.userData = dec.decodeSymbol(lazyModel(mUserData, old))
    }
    if ((changed & 1) != 0)
      last.pointSourceId = icPointSource.decompress(last.pointSourceId)

    val nCtx = if (n == 1) 1 else 0
    var diff = icDx.decompress(lastXDiff(m).get, nCtx)
    last.x += diff
    lastXDiff(m).add(diff)

    var kBits = icDx.k
    diff = icDy.decompress(lastYDiff(m).get,
      nCtx + (if (kBits < 20) kBits & 0xFE else 20))
    last.y += diff
    lastYDiff(m).add(diff)

    kBits = (icDx.k + icDy.k) / 2
    last.z = icZ.decompress(lastHeight(l),
      nCtx + (if (kBits < 18) kBits & 0xFE else 18))
    lastHeight(l) = last.z

    out.copyFrom(last)
  }
}

/** The per-byte folded-difference step shared by the extra-bytes codecs
  * (pointwise [[Byte2V2]] and layered Byte14V3) — one place for the
  * fold arithmetic. */
private[laz] object ByteDiff {
  import LazUtil.u8Fold
  def encode(enc: ArithmeticEncoder, m: ArithmeticModel, cur: Byte, last: Byte): Unit =
    enc.encodeSymbol(m, u8Fold((cur & 0xFF) - (last & 0xFF)))
  def decode(dec: ArithmeticDecoder, m: ArithmeticModel, last: Byte): Byte =
    u8Fold(dec.decodeSymbol(m) + (last & 0xFF)).toByte
}

/** BYTE item codec (v2 layout): user-defined extra bytes, one adaptive
  * 256-symbol model per byte position coding the folded difference to
  * the previous point's byte — the published v2 scheme for extra-bytes
  * payloads. */
final class Byte2V2(enc: ArithmeticEncoder, dec: ArithmeticDecoder, first: LazPoint) {
  private val forDecoder = dec != null
  private val n = first.extra.length
  private val mDiff = Array.fill(n)(new ArithmeticModel(256, forDecoder))
  private val last = first.extra.clone()

  def encode(extra: Array[Byte]): Unit = {
    var i = 0
    while (i < n) {
      ByteDiff.encode(enc, mDiff(i), extra(i), last(i))
      last(i) = extra(i)
      i += 1
    }
  }

  /** Decodes into a fresh array (callers hand it to the row as-is). */
  def decode(): Array[Byte] = {
    var i = 0
    while (i < n) {
      last(i) = ByteDiff.decode(dec, mDiff(i), last(i))
      i += 1
    }
    last.clone()
  }
}

/** GPSTIME11 item codec (v2 layout): four interleaved time sequences,
  * each predicting the next stamp as last + multiplier × last-diff; the
  * multiplier symbol selects prediction context, with full 64-bit
  * resync codes when no sequence predicts within 32 bits. */
final class GpsTime11V2(enc: ArithmeticEncoder, dec: ArithmeticDecoder, first: LazPoint) {
  private val Multi = 500
  private val MultiMinus = -10
  private val MultiUnchanged = Multi - MultiMinus + 1 // 511
  private val MultiCodeFull = Multi - MultiMinus + 2 // 512
  private val MultiTotal = Multi - MultiMinus + 6 // 516

  private val forDecoder = dec != null
  private val mMulti = new ArithmeticModel(MultiTotal, forDecoder)
  private val m0Diff = new ArithmeticModel(6, forDecoder)
  private val icGps = new IntegerCompressor(enc, dec, 32, 9)

  private var last = 0
  private var next = 0
  private val lastGps = new Array[Long](4)
  private val lastDiff = new Array[Int](4)
  private val extreme = new Array[Int](4)
  lastGps(0) = first.gpsTime

  private def quantize(f: Double): Int = {
    val q = if (f >= 0) f + 0.5 else f - 0.5
    // clamp: encoder-only heuristic (the decoder never computes this)
    if (q >= Int.MaxValue.toDouble) Int.MaxValue
    else if (q <= Int.MinValue.toDouble) Int.MinValue
    else q.toInt
  }

  def encode(gps: Long): Unit = {
    if (lastDiff(last) == 0) { // last integer difference was zero
      if (gps == lastGps(last)) {
        enc.encodeSymbol(m0Diff, 0)
      } else {
        val diff64 = gps - lastGps(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          enc.encodeSymbol(m0Diff, 1)
          icGps.compress(0, diff32, 0)
          lastDiff(last) = diff32
          extreme(last) = 0
          lastGps(last) = gps
        } else {
          var i = 1
          while (i < 4) {
            val other64 = gps - lastGps((last + i) & 3)
            if (other64 == other64.toInt.toLong) {
              enc.encodeSymbol(m0Diff, i + 2) // belongs to another sequence
              last = (last + i) & 3
              encode(gps)
              return
            }
            i += 1
          }
          enc.encodeSymbol(m0Diff, 2) // start a new sequence, full 64 bits
          icGps.compress((lastGps(last) >>> 32).toInt, (gps >>> 32).toInt, 8)
          enc.writeInt(gps & 0xFFFFFFFFL)
          next = (next + 1) & 3
          last = next
          lastDiff(last) = 0
          extreme(last) = 0
          lastGps(last) = gps
        }
      }
    } else { // last integer difference was non-zero
      if (gps == lastGps(last)) {
        enc.encodeSymbol(mMulti, MultiUnchanged)
      } else {
        val diff64 = gps - lastGps(last)
        val diff32 = diff64.toInt
        if (diff64 == diff32.toLong) {
          val multi = quantize(diff32.toDouble / lastDiff(last).toDouble)
          if (multi == 1) {
            enc.encodeSymbol(mMulti, 1)
            icGps.compress(lastDiff(last), diff32, 1)
            extreme(last) = 0
          } else if (multi > 0) {
            if (multi < Multi) {
              enc.encodeSymbol(mMulti, multi)
              if (multi < 10) icGps.compress(multi * lastDiff(last), diff32, 2)
              else icGps.compress(multi * lastDiff(last), diff32, 3)
            } else {
              enc.encodeSymbol(mMulti, Multi)
              icGps.compress(Multi * lastDiff(last), diff32, 4)
              extreme(last) += 1
              if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
            }
          } else if (multi < 0) {
            if (multi > MultiMinus) {
              enc.encodeSymbol(mMulti, Multi - multi)
              icGps.compress(multi * lastDiff(last), diff32, 5)
            } else {
              enc.encodeSymbol(mMulti, Multi - MultiMinus)
              icGps.compress(MultiMinus * lastDiff(last), diff32, 6)
              extreme(last) += 1
              if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
            }
          } else { // multi == 0
            enc.encodeSymbol(mMulti, 0)
            icGps.compress(0, diff32, 7)
            extreme(last) += 1
            if (extreme(last) > 3) { lastDiff(last) = diff32; extreme(last) = 0 }
          }
          lastGps(last) = gps
        } else {
          var i = 1
          while (i < 4) {
            val other64 = gps - lastGps((last + i) & 3)
            if (other64 == other64.toInt.toLong) {
              enc.encodeSymbol(mMulti, MultiCodeFull + i)
              last = (last + i) & 3
              encode(gps)
              return
            }
            i += 1
          }
          enc.encodeSymbol(mMulti, MultiCodeFull)
          icGps.compress((lastGps(last) >>> 32).toInt, (gps >>> 32).toInt, 8)
          enc.writeInt(gps & 0xFFFFFFFFL)
          next = (next + 1) & 3
          last = next
          lastDiff(last) = 0
          extreme(last) = 0
          lastGps(last) = gps
        }
      }
    }
  }

  def decode(): Long = {
    if (lastDiff(last) == 0) {
      val multi = dec.decodeSymbol(m0Diff)
      if (multi == 1) {
        val diff = icGps.decompress(0, 0)
        lastDiff(last) = diff
        lastGps(last) += diff
        extreme(last) = 0
      } else if (multi > 2) {
        last = (last + multi - 2) & 3
        return decode()
      } else if (multi == 2) {
        val hi = icGps.decompress((lastGps(last) >>> 32).toInt, 8)
        val lo = dec.readInt()
        next = (next + 1) & 3
        lastGps(next) = (hi.toLong << 32) | lo
        last = next
        lastDiff(last) = 0
        extreme(last) = 0
      }
      // multi == 0: stamp unchanged
    } else {
      val multi = dec.decodeSymbol(mMulti)
      if (multi == 1) {
        lastGps(last) += icGps.decompress(lastDiff(last), 1)
        extreme(last) = 0
      } else if (multi < MultiUnchanged) {
        var diff = 0
        if (multi == 0) {
          diff = icGps.decompress(0, 7)
          extreme(last) += 1
          if (extreme(last) > 3) { lastDiff(last) = diff; extreme(last) = 0 }
        } else if (multi < Multi) {
          if (multi < 10) diff = icGps.decompress(multi * lastDiff(last), 2)
          else diff = icGps.decompress(multi * lastDiff(last), 3)
        } else if (multi == Multi) {
          diff = icGps.decompress(Multi * lastDiff(last), 4)
          extreme(last) += 1
          if (extreme(last) > 3) { lastDiff(last) = diff; extreme(last) = 0 }
        } else {
          val neg = Multi - multi // the encoded negative multiplier
          if (neg > MultiMinus) {
            diff = icGps.decompress(neg * lastDiff(last), 5)
          } else {
            diff = icGps.decompress(MultiMinus * lastDiff(last), 6)
            extreme(last) += 1
            if (extreme(last) > 3) { lastDiff(last) = diff; extreme(last) = 0 }
          }
        }
        lastGps(last) += diff
      } else if (multi == MultiUnchanged) {
        // stamp unchanged
      } else if (multi == MultiCodeFull) {
        val hi = icGps.decompress((lastGps(last) >>> 32).toInt, 8)
        val lo = dec.readInt()
        next = (next + 1) & 3
        lastGps(next) = (hi.toLong << 32) | lo
        last = next
        lastDiff(last) = 0
        extreme(last) = 0
      } else { // multi > MultiCodeFull: switch sequence and retry
        last = (last + multi - MultiCodeFull) & 3
        return decode()
      }
    }
    lastGps(last)
  }
}

/** RGB12 item codec (v2 layout): a 7-bit changed-byte symbol (low/high
  * byte of each channel + a "green/blue differ from red" flag), then
  * per-byte folded differences where green predicts from the red delta
  * and blue from the averaged red/green deltas. */
final class Rgb12V2(enc: ArithmeticEncoder, dec: ArithmeticDecoder, first: LazPoint) {
  import LazUtil._
  private val forDecoder = dec != null
  private val mByteUsed = new ArithmeticModel(128, forDecoder)
  private val mDiff: Array[ArithmeticModel] =
    Array.fill(6)(new ArithmeticModel(256, forDecoder))

  private var lastR = first.red
  private var lastG = first.green
  private var lastB = first.blue

  /** Current prediction state — seeds a fresh scanner-channel context in
    * the layered (v3) RGB codec. */
  def last: (Int, Int, Int) = (lastR, lastG, lastB)

  def encode(r: Int, g: Int, b: Int): Unit = {
    val rl = r & 0xFF; val rh = r >>> 8
    val gl = g & 0xFF; val gh = g >>> 8
    val bl = b & 0xFF; val bh = b >>> 8
    val lrl = lastR & 0xFF; val lrh = lastR >>> 8
    val lgl = lastG & 0xFF; val lgh = lastG >>> 8
    val lbl = lastB & 0xFF; val lbh = lastB >>> 8

    val colored = rl != gl || rl != bl || rh != gh || rh != bh
    var sym = 0
    if (rl != lrl) sym |= 1
    if (rh != lrh) sym |= 2
    if (colored) {
      sym |= 64
      if (gl != lgl) sym |= 4
      if (gh != lgh) sym |= 8
      if (bl != lbl) sym |= 16
      if (bh != lbh) sym |= 32
    }
    enc.encodeSymbol(mByteUsed, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(mDiff(0), u8Fold(rl - lrl))
    if ((sym & 2) != 0) enc.encodeSymbol(mDiff(1), u8Fold(rh - lrh))
    if (colored) {
      var diff = rl - lrl
      if ((sym & 4) != 0) enc.encodeSymbol(mDiff(2), u8Fold(gl - u8Clamp(diff + lgl)))
      if ((sym & 16) != 0) {
        diff = (diff + gl - lgl) / 2
        enc.encodeSymbol(mDiff(4), u8Fold(bl - u8Clamp(diff + lbl)))
      }
      diff = rh - lrh
      if ((sym & 8) != 0) enc.encodeSymbol(mDiff(3), u8Fold(gh - u8Clamp(diff + lgh)))
      if ((sym & 32) != 0) {
        diff = (diff + gh - lgh) / 2
        enc.encodeSymbol(mDiff(5), u8Fold(bh - u8Clamp(diff + lbh)))
      }
    }
    lastR = r; lastG = g; lastB = b
  }

  /** Decodes into (red, green, blue) on `out`. */
  def decode(out: LazPoint): Unit = {
    val lrl = lastR & 0xFF; val lrh = lastR >>> 8
    val lgl = lastG & 0xFF; val lgh = lastG >>> 8
    val lbl = lastB & 0xFF; val lbh = lastB >>> 8

    val sym = dec.decodeSymbol(mByteUsed)
    val rl = if ((sym & 1) != 0) u8Fold(dec.decodeSymbol(mDiff(0)) + lrl) else lrl
    val rh = if ((sym & 2) != 0) u8Fold(dec.decodeSymbol(mDiff(1)) + lrh) else lrh
    var gl = 0; var gh = 0; var bl = 0; var bh = 0
    if ((sym & 64) != 0) {
      var diff = rl - lrl
      gl = if ((sym & 4) != 0) u8Fold(dec.decodeSymbol(mDiff(2)) + u8Clamp(diff + lgl)) else lgl
      if ((sym & 16) != 0) {
        diff = (diff + gl - lgl) / 2
        bl = u8Fold(dec.decodeSymbol(mDiff(4)) + u8Clamp(diff + lbl))
      } else bl = lbl
      diff = rh - lrh
      gh = if ((sym & 8) != 0) u8Fold(dec.decodeSymbol(mDiff(3)) + u8Clamp(diff + lgh)) else lgh
      if ((sym & 32) != 0) {
        diff = (diff + gh - lgh) / 2
        bh = u8Fold(dec.decodeSymbol(mDiff(5)) + u8Clamp(diff + lbh))
      } else bh = lbh
    } else {
      gl = rl; gh = rh; bl = rl; bh = rh
    }
    lastR = rl | (rh << 8)
    lastG = gl | (gh << 8)
    lastB = bl | (bh << 8)
    out.red = lastR; out.green = lastG; out.blue = lastB
  }
}
