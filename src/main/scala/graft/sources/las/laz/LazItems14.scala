package graft.sources.las.laz

/** Layered (v3) item codecs for the LAS 1.4 extended point records —
  * LASzip point formats 6-8 (items POINT14 / RGB14 / RGBNIR14).
  *
  * The published v3 design (LASzip "native extension" for LAS 1.4;
  * consumed by the reference through laz-rs, pc-io/Cargo.toml:14-15)
  * differs from the pointwise v2 scheme in two load-bearing ways, both
  * reproduced here:
  *
  *  - **Layers.** Each chunk separates its fields into independently
  *    arithmetic-coded byte streams ("layers": returns/XY, Z,
  *    classification, flags, intensity, scan angle, user data, point
  *    source, gps time, and one per color item), each with its own coder
  *    state, prefixed by per-layer byte counts. A reader can therefore
  *    skip — not even decode — the layers its projection does not need
  *    (selective decompression). The DSv2 source feeds Spark's column
  *    pruning straight into this: `select(x, y)` never touches the gps /
  *    RGB / classification bytes.
  *  - **Scanner-channel contexts.** All prediction state (last point,
  *    medians, models) is banked per scanner channel (4 contexts);
  *    interleaved flight lines each predict from their own history. A
  *    channel's bank initializes lazily from the previously active bank
  *    on first use, exactly like the published scheme.
  *
  * Within a layer, symbol/corrector layouts reuse this codec's proven v2
  * building blocks ([[IntegerCompressor]], [[StreamingMedian5]], the v2
  * context-mapping tables clamped from the extended 4-bit return counts,
  * [[GpsTime11V2]] per channel, [[Rgb12V2]] per channel). Where the v3
  * specification's fine-grained model tables are not reproducible in
  * this sandbox, the layouts are this codec's own — byte compatibility
  * with laszip-written files is untested either way (no sample files, no
  * codec library, zero egress; see [[LazFormat]]), and the tested
  * contract is encode→decode identity plus LAZ≡LAS DSv2 equality.
  *
  * Chunk framing (the container contract the chunk table points into):
  * raw anchor point, u32 point count, one u32 byte size per layer, then
  * the layer byte blobs in the same order.
  */
object LazLayers {
  // POINT14 layers (order is the wire order of sizes and blobs)
  val XY = 0 // changed-values symbol, channel switch, returns, dx, dy
  val Z = 1
  val Cls = 2
  val Flags = 3 // classification-flags nibble + scan direction + edge
  val Intens = 4
  val ScanAngle = 5
  val UserData = 6
  val PointSource = 7
  val Gps = 8
  val NumPoint14 = 9
  /** RGB item layer position in the flat per-chunk layer list. */
  val Rgb = 9
  /** NIR layer position (format 8; the RGBNIR14 item's second layer). */
  val Nir = 10

  def numLayers(pointFormat: Int): Int = pointFormat match {
    case 6 => NumPoint14
    case 7 => NumPoint14 + 1
    case 8 => NumPoint14 + 2
    case f => throw new IllegalArgumentException(s"not an extended point format: $f")
  }
}

/** POINT14 (v3, layered) codec. Construct with the 9 per-layer encoders
  * (encode side) or decoders (decode side; null entries mark skipped
  * layers — XY must be present, and ScanAngle requires Flags for the
  * scan-direction corrector context). `first` is the chunk's raw-stored
  * anchor point. */
final class Point14V3(
    encs: Array[ArithmeticEncoder],
    decs: Array[ArithmeticDecoder],
    first: LazPoint) {
  import LazLayers._
  import LazUtil.{NumberReturnLevel, NumberReturnMap}

  private val forDecoder = decs != null
  private def enc(l: Int): ArithmeticEncoder = if (encs == null) null else encs(l)
  private def dec(l: Int): ArithmeticDecoder = if (decs == null) null else decs(l)
  /** Is this layer being coded? (encode: always; decode: when requested). */
  private def active(l: Int): Boolean = if (forDecoder) decs(l) != null else true
  require(active(XY), "POINT14: the returns/XY layer is mandatory")
  require(!active(ScanAngle) || active(Flags),
    "POINT14: the scan-angle layer needs the flags layer (scan-direction context)")

  /** One scanner channel's complete prediction bank. */
  private final class Ctx(initFrom: LazPoint) {
    val last = new LazPoint
    last.copyFrom(initFrom)
    var lastGpsChanged = false
    // XY layer
    val mChanged: Array[ArithmeticModel] =
      Array.fill(8)(new ArithmeticModel(128, forDecoder))
    val mChannelDiff = new ArithmeticModel(3, forDecoder)
    val mNumReturns = new Array[ArithmeticModel](16)
    val mReturnNumber = new Array[ArithmeticModel](16)
    val medX = Array.fill(16)(new StreamingMedian5)
    val medY = Array.fill(16)(new StreamingMedian5)
    val icDx = new IntegerCompressor(enc(XY), dec(XY), 32, 2)
    val icDy = new IntegerCompressor(enc(XY), dec(XY), 32, 22)
    // other layers (allocated only when coded)
    val icZ = if (active(Z)) new IntegerCompressor(enc(Z), dec(Z), 32, 20) else null
    val lastHeight = new Array[Int](8)
    val mCls = if (active(Cls)) new Array[ArithmeticModel](256) else null
    val mFlags = if (active(Flags)) new Array[ArithmeticModel](64) else null
    val icIntensity =
      if (active(Intens)) new IntegerCompressor(enc(Intens), dec(Intens), 16, 4) else null
    val lastIntensity = new Array[Int](16)
    val icScanAngle =
      if (active(ScanAngle)) new IntegerCompressor(enc(ScanAngle), dec(ScanAngle), 16, 2)
      else null
    val mUserData = if (active(UserData)) new Array[ArithmeticModel](256) else null
    val icPointSource =
      if (active(PointSource)) new IntegerCompressor(enc(PointSource), dec(PointSource), 16, 1)
      else null
    val gps = if (active(Gps)) new GpsTime11V2(enc(Gps), dec(Gps), last) else null

    def model(arr: Array[ArithmeticModel], ctx: Int, symbols: Int): ArithmeticModel = {
      if (arr(ctx) == null) arr(ctx) = new ArithmeticModel(symbols, forDecoder)
      arr(ctx)
    }
  }

  private val ctxs = new Array[Ctx](4)
  /** Scanner channel of the last coded point = active context bank. */
  private var cc = (first.extFlags >>> 4) & 3
  ctxs(cc) = new Ctx(first)

  /** The context the last point selected — the color items follow it. */
  def context: Int = cc

  private def clamp7(v: Int): Int = if (v > 7) 7 else v

  /** Model selector for the changed-values symbol: last point's
    * single-return / last-return / gps-changed bits (decoder-visible
    * before the symbol itself). */
  private def lprOf(c: Ctx): Int = {
    val lastR = c.last.returns & 0x0F
    val lastN = (c.last.returns >>> 4) & 0x0F
    (if (lastR == 1) 1 else 0) |
      (if (lastR >= lastN) 2 else 0) |
      (if (c.lastGpsChanged) 4 else 0)
  }

  def encode(cur: LazPoint): Unit = {
    val old = ctxs(cc)
    val c = (cur.extFlags >>> 4) & 3
    val channelChanged = c != cc
    // diffs are taken against the bank the point will be coded in (a
    // fresh bank copies the old bank's last, so "old last" still holds)
    val target = if (channelChanged && ctxs(c) != null) ctxs(c) else old
    val tl = target.last

    val r = cur.returns & 0x0F
    val n = (cur.returns >>> 4) & 0x0F
    val lastR = tl.returns & 0x0F
    val lastN = (tl.returns >>> 4) & 0x0F
    val rDiff = (r - lastR) & 0x0F
    val rCode = if (rDiff == 0) 0 else if (rDiff == 1) 1 else if (rDiff == 15) 2 else 3
    val gpsChanged = cur.gpsTime != tl.gpsTime
    val changed =
      (if (channelChanged) 64 else 0) |
        (if (cur.pointSourceId != tl.pointSourceId) 32 else 0) |
        (if (gpsChanged) 16 else 0) |
        (if (cur.scanAngle != tl.scanAngle) 8 else 0) |
        (if (n != lastN) 4 else 0) |
        rCode
    encs(XY).encodeSymbol(old.mChanged(lprOf(old)), changed)

    var ctx = old
    if (channelChanged) {
      encs(XY).encodeSymbol(old.mChannelDiff, ((c - cc) & 3) - 1)
      if (ctxs(c) == null) ctxs(c) = new Ctx(old.last)
      cc = c
      ctx = ctxs(cc)
    }

    if ((changed & 4) != 0)
      encs(XY).encodeSymbol(ctx.model(ctx.mNumReturns, lastN, 16), n)
    if (rCode == 3)
      encs(XY).encodeSymbol(ctx.model(ctx.mReturnNumber, lastR, 16), r)

    val m = NumberReturnMap(clamp7(n))(clamp7(r))
    val l = NumberReturnLevel(clamp7(n))(clamp7(r))
    val nCtx = if (n == 1) 1 else 0
    var diff = cur.x - tl.x
    ctx.icDx.compress(ctx.medX(m).get, diff, nCtx)
    ctx.medX(m).add(diff)
    var kBits = ctx.icDx.k
    diff = cur.y - tl.y
    ctx.icDy.compress(ctx.medY(m).get, diff,
      nCtx + (if (kBits < 20) kBits & 0xFE else 20))
    ctx.medY(m).add(diff)

    kBits = (ctx.icDx.k + ctx.icDy.k) / 2
    ctx.icZ.compress(ctx.lastHeight(l), cur.z,
      nCtx + (if (kBits < 18) kBits & 0xFE else 18))
    ctx.lastHeight(l) = cur.z

    encs(Cls).encodeSymbol(
      ctx.model(ctx.mCls, tl.classification, 256), cur.classification)

    // flags layer: classification-flags nibble + scan direction + edge
    // (channel bits travel in the XY layer)
    val f = (cur.extFlags & 0x0F) | ((cur.extFlags >>> 2) & 0x30)
    val lf = (tl.extFlags & 0x0F) | ((tl.extFlags >>> 2) & 0x30)
    encs(Flags).encodeSymbol(ctx.model(ctx.mFlags, lf, 64), f)

    ctx.icIntensity.compress(ctx.lastIntensity(m), cur.intensity, if (m < 3) m else 3)
    ctx.lastIntensity(m) = cur.intensity

    if ((changed & 8) != 0)
      ctx.icScanAngle.compress(tl.scanAngle & 0xFFFF, cur.scanAngle & 0xFFFF,
        (cur.extFlags >>> 6) & 1)

    encs(UserData).encodeSymbol(ctx.model(ctx.mUserData, tl.userData, 256), cur.userData)

    if ((changed & 32) != 0)
      ctx.icPointSource.compress(tl.pointSourceId, cur.pointSourceId)

    if ((changed & 16) != 0) ctx.gps.encode(cur.gpsTime)

    ctx.last.copyFrom(cur)
    ctx.lastGpsChanged = gpsChanged
  }

  def decode(out: LazPoint): Unit = {
    val old = ctxs(cc)
    val changed = decs(XY).decodeSymbol(old.mChanged(lprOf(old)))

    var ctx = old
    if ((changed & 64) != 0) {
      val c = (cc + decs(XY).decodeSymbol(old.mChannelDiff) + 1) & 3
      if (ctxs(c) == null) ctxs(c) = new Ctx(old.last)
      cc = c
      ctx = ctxs(cc)
    }
    val tl = ctx.last
    // the channel always rides in extFlags, even when the flags layer is
    // skipped (a fresh bank carries the donor bank's channel bits)
    tl.extFlags = (tl.extFlags & 0xCF) | (cc << 4)

    val lastR = tl.returns & 0x0F
    val lastN = (tl.returns >>> 4) & 0x0F
    val n =
      if ((changed & 4) != 0) decs(XY).decodeSymbol(ctx.model(ctx.mNumReturns, lastN, 16))
      else lastN
    val r = (changed & 3) match {
      case 0 => lastR
      case 1 => (lastR + 1) & 0x0F
      case 2 => (lastR + 15) & 0x0F
      case _ => decs(XY).decodeSymbol(ctx.model(ctx.mReturnNumber, lastR, 16))
    }
    tl.returns = r | (n << 4)

    val m = NumberReturnMap(clamp7(n))(clamp7(r))
    val l = NumberReturnLevel(clamp7(n))(clamp7(r))
    val nCtx = if (n == 1) 1 else 0
    var diff = ctx.icDx.decompress(ctx.medX(m).get, nCtx)
    tl.x += diff
    ctx.medX(m).add(diff)
    var kBits = ctx.icDx.k
    diff = ctx.icDy.decompress(ctx.medY(m).get,
      nCtx + (if (kBits < 20) kBits & 0xFE else 20))
    tl.y += diff
    ctx.medY(m).add(diff)

    if (active(Z)) {
      kBits = (ctx.icDx.k + ctx.icDy.k) / 2
      tl.z = ctx.icZ.decompress(ctx.lastHeight(l),
        nCtx + (if (kBits < 18) kBits & 0xFE else 18))
      ctx.lastHeight(l) = tl.z
    }

    if (active(Cls)) {
      val prev = tl.classification
      tl.classification = decs(Cls).decodeSymbol(ctx.model(ctx.mCls, prev, 256))
    }

    var scanDir = (tl.extFlags >>> 6) & 1
    if (active(Flags)) {
      val lf = (tl.extFlags & 0x0F) | ((tl.extFlags >>> 2) & 0x30)
      val f = decs(Flags).decodeSymbol(ctx.model(ctx.mFlags, lf, 64))
      tl.extFlags = (f & 0x0F) | (cc << 4) | ((f & 0x30) << 2)
      scanDir = (f >>> 4) & 1
    }

    if (active(Intens)) {
      tl.intensity = ctx.icIntensity.decompress(ctx.lastIntensity(m), if (m < 3) m else 3)
      ctx.lastIntensity(m) = tl.intensity
    }

    if (active(ScanAngle) && (changed & 8) != 0)
      tl.scanAngle =
        ctx.icScanAngle.decompress(tl.scanAngle & 0xFFFF, scanDir).toShort.toInt

    if (active(UserData)) {
      val prev = tl.userData
      tl.userData = decs(UserData).decodeSymbol(ctx.model(ctx.mUserData, prev, 256))
    }

    if (active(PointSource) && (changed & 32) != 0)
      tl.pointSourceId = ctx.icPointSource.decompress(tl.pointSourceId)

    if (active(Gps) && (changed & 16) != 0) tl.gpsTime = ctx.gps.decode()

    ctx.lastGpsChanged = (changed & 16) != 0
    out.copyFrom(tl)
  }
}

/** RGB14 (v3): one [[Rgb12V2]] prediction bank per scanner channel in
  * the item's own layer; the active channel follows [[Point14V3]]. */
final class Rgb14V3(
    enc: ArithmeticEncoder, dec: ArithmeticDecoder, first: LazPoint) {
  private val banks = new Array[Rgb12V2](4)
  private var cur = (first.extFlags >>> 4) & 3
  banks(cur) = new Rgb12V2(enc, dec, first)

  private def switchTo(channel: Int): Rgb12V2 = {
    if (channel != cur) {
      if (banks(channel) == null) {
        val (r, g, b) = banks(cur).last
        val seed = new LazPoint
        seed.red = r; seed.green = g; seed.blue = b
        banks(channel) = new Rgb12V2(enc, dec, seed)
      }
      cur = channel
    }
    banks(cur)
  }

  def encode(channel: Int, r: Int, g: Int, b: Int): Unit =
    switchTo(channel).encode(r, g, b)

  def decode(channel: Int, out: LazPoint): Unit =
    switchTo(channel).decode(out)
}

/** BYTE14 (v3, layered): user-defined extra bytes, one layer per byte
  * position (each independently skippable), per-scanner-channel banks,
  * folded-difference coding per byte like the v2 BYTE scheme. `decs`
  * layers may be null only as a whole item (all-or-nothing skip, since
  * the column is one opaque binary value). */
final class Byte14V3(
    encs: Array[ArithmeticEncoder], decs: Array[ArithmeticDecoder],
    first: LazPoint) {
  private val forDecoder = decs != null
  private val n = first.extra.length
  require(if (forDecoder) decs.length == n else encs.length == n,
    "BYTE14 needs one layer per extra byte")

  private final class Bank(initFrom: Array[Byte]) {
    val last = initFrom.clone()
    val mDiff = Array.fill(n)(new ArithmeticModel(256, forDecoder))
  }

  private val banks = new Array[Bank](4)
  private var cur = (first.extFlags >>> 4) & 3
  banks(cur) = new Bank(first.extra)

  private def switchTo(channel: Int): Bank = {
    if (channel != cur) {
      if (banks(channel) == null) banks(channel) = new Bank(banks(cur).last)
      cur = channel
    }
    banks(cur)
  }

  def encode(channel: Int, extra: Array[Byte]): Unit = {
    val b = switchTo(channel)
    var i = 0
    while (i < n) {
      ByteDiff.encode(encs(i), b.mDiff(i), extra(i), b.last(i))
      b.last(i) = extra(i)
      i += 1
    }
  }

  def decode(channel: Int): Array[Byte] = {
    val b = switchTo(channel)
    var i = 0
    while (i < n) {
      b.last(i) = ByteDiff.decode(decs(i), b.mDiff(i), b.last(i))
      i += 1
    }
    b.last.clone()
  }
}

/** NIR layer of the RGBNIR14 item (v3): per-channel banks; a 4-symbol
  * low/high-byte-changed mask, then folded byte differences — the same
  * shape as one RGB channel. */
final class Nir14V3(
    enc: ArithmeticEncoder, dec: ArithmeticDecoder, first: LazPoint) {
  import LazUtil.u8Fold
  private val forDecoder = dec != null

  private final class Bank(initNir: Int) {
    var last = initNir
    val mSym = new ArithmeticModel(4, forDecoder)
    val mDiffLo = new ArithmeticModel(256, forDecoder)
    val mDiffHi = new ArithmeticModel(256, forDecoder)
  }

  private val banks = new Array[Bank](4)
  private var cur = (first.extFlags >>> 4) & 3
  banks(cur) = new Bank(first.nir)

  private def switchTo(channel: Int): Bank = {
    if (channel != cur) {
      if (banks(channel) == null) banks(channel) = new Bank(banks(cur).last)
      cur = channel
    }
    banks(cur)
  }

  def encode(channel: Int, nir: Int): Unit = {
    val b = switchTo(channel)
    val lo = nir & 0xFF; val hi = (nir >>> 8) & 0xFF
    val llo = b.last & 0xFF; val lhi = (b.last >>> 8) & 0xFF
    val sym = (if (lo != llo) 1 else 0) | (if (hi != lhi) 2 else 0)
    enc.encodeSymbol(b.mSym, sym)
    if ((sym & 1) != 0) enc.encodeSymbol(b.mDiffLo, u8Fold(lo - llo))
    if ((sym & 2) != 0) enc.encodeSymbol(b.mDiffHi, u8Fold(hi - lhi))
    b.last = nir
  }

  def decode(channel: Int): Int = {
    val b = switchTo(channel)
    val llo = b.last & 0xFF; val lhi = (b.last >>> 8) & 0xFF
    val sym = dec.decodeSymbol(b.mSym)
    val lo = if ((sym & 1) != 0) u8Fold(dec.decodeSymbol(b.mDiffLo) + llo) else llo
    val hi = if ((sym & 2) != 0) u8Fold(dec.decodeSymbol(b.mDiffHi) + lhi) else lhi
    b.last = lo | (hi << 8)
    b.last
  }
}
