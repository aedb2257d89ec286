package graft.sources.las.laz

/** Adaptive arithmetic coder for the LAZ (LASzip) point codec.
  *
  * This is a from-scratch implementation of the public compression scheme
  * LASzip documents (Isenburg, "LASzip: lossless compression of LiDAR
  * data", PE&RS 2013): an Amir-Said-style range coder ("FastAC") with
  * adaptive frequency models, periodically rescaled, driving the integer
  * correctors in [[IntegerCompressor]]. The reference engine consumes the
  * same stream format via the `laz` crate (pc-io/Cargo.toml:14-15); here
  * the codec itself is part of the library so the DSv2 source has no
  * native dependency.
  *
  * All 32-bit unsigned state is kept in `Long`s masked to 32 bits — the
  * JVM has no u32, and the codec's correctness depends on u32 wraparound
  * and unsigned compares.
  */
object Ac {
  val MaxLength: Long = 0xFFFFFFFFL
  val MinLength: Long = 0x01000000L
  /** Scaled-probability precision of symbol models. */
  val LengthShift: Int = 15
  val MaxCount: Int = 1 << LengthShift
  /** Scaled-probability precision of binary models. */
  val BitLengthShift: Int = 13
  val BitMaxCount: Int = 1 << BitLengthShift
}

/** Adaptive multi-symbol frequency model. `forDecoder` additionally
  * maintains the table-lookup index used for fast symbol search. */
final class ArithmeticModel(val symbols: Int, forDecoder: Boolean) {
  require(symbols >= 2, s"model needs >=2 symbols, got $symbols")
  val lastSymbol: Int = symbols - 1
  val distribution = new Array[Int](symbols) // scaled cumulative frequencies
  val symbolCount = new Array[Int](symbols)
  var totalCount: Int = 0
  var updateCycle: Int = 0
  var symbolsUntilUpdate: Int = 0

  // decoder lookup table for larger alphabets
  val tableBits: Int = if (symbols > 16) {
    var b = 3
    while (symbols > (1 << (b + 2))) b += 1
    b
  } else 0
  val tableShift: Int = if (tableBits > 0) Ac.LengthShift - tableBits else 0
  val decoderTable: Array[Int] =
    if (forDecoder && tableBits > 0) new Array[Int]((1 << tableBits) + 2) else null

  reset()

  def reset(): Unit = {
    totalCount = 0
    updateCycle = symbols
    java.util.Arrays.fill(symbolCount, 1)
    update()
    updateCycle = (symbols + 6) >> 1
    symbolsUntilUpdate = updateCycle
  }

  def update(): Unit = {
    // halve counts when the rescale threshold is reached
    totalCount += updateCycle
    if (totalCount > Ac.MaxCount) {
      totalCount = 0
      var n = 0
      while (n < symbols) {
        symbolCount(n) = (symbolCount(n) + 1) >> 1
        totalCount += symbolCount(n)
        n += 1
      }
    }
    // scaled cumulative distribution (and the decoder's lookup table)
    val scale = (0x80000000L / totalCount) & 0xFFFFFFFFL
    var k = 0
    var sum = 0
    if (decoderTable == null) {
      while (k < symbols) {
        distribution(k) = ((scale * sum) >>> (31 - Ac.LengthShift)).toInt
        sum += symbolCount(k)
        k += 1
      }
    } else {
      val tableSize = 1 << tableBits
      var s = 0
      while (k < symbols) {
        distribution(k) = ((scale * sum) >>> (31 - Ac.LengthShift)).toInt
        sum += symbolCount(k)
        val w = distribution(k) >>> tableShift
        while (s < w) { s += 1; decoderTable(s) = k - 1 }
        k += 1
      }
      decoderTable(0) = 0
      while (s <= tableSize) { s += 1; decoderTable(s) = symbols - 1 }
    }
    updateCycle = (5 * updateCycle) >> 2
    val maxCycle = (symbols + 6) << 3
    if (updateCycle > maxCycle) updateCycle = maxCycle
    symbolsUntilUpdate = updateCycle
  }
}

/** Adaptive binary model (cheaper than a 2-symbol [[ArithmeticModel]]). */
final class ArithmeticBitModel {
  var bit0Count = 1
  var bitCount = 2
  var bit0Prob: Int = 1 << (Ac.BitLengthShift - 1)
  var updateCycle = 4
  var symbolsUntilUpdate = 4

  def reset(): Unit = {
    bit0Count = 1; bitCount = 2
    bit0Prob = 1 << (Ac.BitLengthShift - 1)
    updateCycle = 4; symbolsUntilUpdate = 4
  }

  def update(): Unit = {
    bitCount += updateCycle
    if (bitCount > Ac.BitMaxCount) {
      bitCount = (bitCount + 1) >> 1
      bit0Count = (bit0Count + 1) >> 1
      if (bit0Count == bitCount) bitCount += 1
    }
    val scale = (0x80000000L / bitCount) & 0xFFFFFFFFL
    bit0Prob = ((bit0Count.toLong * scale) >>> (31 - Ac.BitLengthShift)).toInt
    updateCycle = (5 * updateCycle) >> 2
    if (updateCycle > 64) updateCycle = 64
    symbolsUntilUpdate = updateCycle
  }
}

/** Range encoder over a growable in-memory buffer (LAZ chunks are
  * bounded — 50k points — so chunk-at-a-time buffering is the design,
  * matching the chunk table contract). */
final class ArithmeticEncoder {
  private var buf = new Array[Byte](4096)
  private var pos = 0
  private var base = 0L // u32
  private var length = Ac.MaxLength

  def init(): Unit = { pos = 0; base = 0L; length = Ac.MaxLength }

  private def ensure(n: Int): Unit =
    if (pos + n > buf.length) {
      val grown = new Array[Byte](math.max(buf.length * 2, pos + n))
      System.arraycopy(buf, 0, grown, 0, pos)
      buf = grown
    }

  private def propagateCarry(): Unit = {
    var p = pos - 1
    while (buf(p) == -1) { buf(p) = 0; p -= 1 }
    buf(p) = (buf(p) + 1).toByte
  }

  private def renorm(): Unit = {
    do {
      ensure(1)
      buf(pos) = (base >>> 24).toByte
      pos += 1
      base = (base << 8) & 0xFFFFFFFFL
      length = (length << 8) & 0xFFFFFFFFL
    } while (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0)
  }

  def encodeSymbol(m: ArithmeticModel, sym: Int): Unit = {
    val initBase = base
    if (sym == m.lastSymbol) {
      // the last symbol's interval extends to the old top: x is scaled off
      // the (un-assigned) shifted length but the remaining length is the
      // full pre-shift length minus x
      val x = (m.distribution(sym).toLong & 0xFFFFFFFFL) * (length >>> Ac.LengthShift)
      base = (base + x) & 0xFFFFFFFFL
      length = (length - x) & 0xFFFFFFFFL
    } else {
      val lshift = length >>> Ac.LengthShift
      val x = (m.distribution(sym).toLong & 0xFFFFFFFFL) * lshift
      base = (base + x) & 0xFFFFFFFFL
      length = ((m.distribution(sym + 1).toLong & 0xFFFFFFFFL) * lshift - x) & 0xFFFFFFFFL
    }
    if (java.lang.Long.compareUnsigned(initBase, base) > 0) propagateCarry()
    if (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0) renorm()
    m.symbolCount(sym) += 1
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
  }

  def encodeBit(m: ArithmeticBitModel, bit: Int): Unit = {
    val x = (m.bit0Prob.toLong & 0xFFFFFFFFL) * (length >>> Ac.BitLengthShift)
    if (bit == 0) {
      length = x
      m.bit0Count += 1
    } else {
      val initBase = base
      base = (base + x) & 0xFFFFFFFFL
      length = (length - x) & 0xFFFFFFFFL
      if (java.lang.Long.compareUnsigned(initBase, base) > 0) propagateCarry()
    }
    if (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0) renorm()
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
  }

  /** Raw bits through the coder (uniform model). Splits >19-bit writes to
    * preserve precision, low half first. */
  def writeBits(bits: Int, value: Long): Unit = {
    if (bits > 19) {
      writeBits(16, value & 0xFFFF)
      writeBits(bits - 16, (value >>> 16) & 0xFFFFFFFFL)
    } else {
      val initBase = base
      length >>>= bits
      base = (base + (value & 0xFFFFFFFFL) * length) & 0xFFFFFFFFL
      if (java.lang.Long.compareUnsigned(initBase, base) > 0) propagateCarry()
      if (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0) renorm()
    }
  }

  def writeInt(v: Long): Unit = writeBits(32, v & 0xFFFFFFFFL)

  /** Flush the final interval; appends the safety zero-bytes the decoder
    * may over-read. Returns the finished chunk payload. */
  def done(): Array[Byte] = {
    val initBase = base
    var anotherByte = true
    if (java.lang.Long.compareUnsigned(length, 2 * Ac.MinLength) > 0) {
      base = (base + Ac.MinLength) & 0xFFFFFFFFL
      length = Ac.MinLength >>> 1
    } else {
      base = (base + (Ac.MinLength >>> 1)) & 0xFFFFFFFFL
      length = Ac.MinLength >>> 9
      anotherByte = false
    }
    if (java.lang.Long.compareUnsigned(initBase, base) > 0) propagateCarry()
    renorm()
    ensure(3)
    buf(pos) = 0; pos += 1
    buf(pos) = 0; pos += 1
    if (anotherByte) { buf(pos) = 0; pos += 1 }
    java.util.Arrays.copyOf(buf, pos)
  }
}

/** Range decoder over a byte slice; reads past the end yield zero bytes
  * (the encoder pads with zeros, and the final chunk of a stream may be
  * truncated to its true payload size by the chunk table). */
final class ArithmeticDecoder(buf: Array[Byte], start: Int, end: Int) {
  private var p = start
  private var value = 0L
  private var length = 0L

  def init(): Unit = {
    value = ((nextByte() << 24) | (nextByte() << 16) | (nextByte() << 8) | nextByte()) & 0xFFFFFFFFL
    length = Ac.MaxLength
  }

  private def nextByte(): Long = {
    val b = if (p < end) (buf(p).toLong & 0xFF) else 0L
    p += 1
    b
  }

  private def renorm(): Unit = {
    do {
      value = ((value << 8) | nextByte()) & 0xFFFFFFFFL
      length = (length << 8) & 0xFFFFFFFFL
    } while (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0)
  }

  def decodeSymbol(m: ArithmeticModel): Int = {
    var sym = 0
    var x = 0L
    var y = length
    if (m.decoderTable != null) {
      length >>>= Ac.LengthShift
      val dv = java.lang.Long.divideUnsigned(value, length)
      val t = (dv >>> m.tableShift).toInt
      sym = m.decoderTable(t)
      var n = m.decoderTable(t + 1) + 1
      while (n > sym + 1) {
        val mid = (sym + n) >>> 1
        if (java.lang.Long.compareUnsigned(m.distribution(mid).toLong & 0xFFFFFFFFL, dv) > 0) n = mid
        else sym = mid
      }
      x = (m.distribution(sym).toLong & 0xFFFFFFFFL) * length
      if (sym != m.lastSymbol) y = (m.distribution(sym + 1).toLong & 0xFFFFFFFFL) * length
    } else {
      length >>>= Ac.LengthShift
      var n = m.symbols
      var mid = n >>> 1
      var continue = true
      while (continue) {
        val z = length * (m.distribution(mid).toLong & 0xFFFFFFFFL)
        if (java.lang.Long.compareUnsigned(z, value) > 0) { n = mid; y = z }
        else { sym = mid; x = z }
        mid = (sym + n) >>> 1
        if (mid == sym) continue = false
      }
    }
    value = (value - x) & 0xFFFFFFFFL
    length = (y - x) & 0xFFFFFFFFL
    if (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0) renorm()
    m.symbolCount(sym) += 1
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
    sym
  }

  def decodeBit(m: ArithmeticBitModel): Int = {
    val x = (m.bit0Prob.toLong & 0xFFFFFFFFL) * (length >>> Ac.BitLengthShift)
    val bit = if (java.lang.Long.compareUnsigned(value, x) >= 0) 1 else 0
    if (bit == 0) {
      length = x
      m.bit0Count += 1
    } else {
      value = (value - x) & 0xFFFFFFFFL
      length = (length - x) & 0xFFFFFFFFL
    }
    if (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0) renorm()
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
    bit
  }

  def readBits(bits: Int): Long =
    if (bits > 19) {
      val lo = readBits(16)
      val hi = readBits(bits - 16)
      (hi << 16) | lo
    } else {
      length >>>= bits
      val s = java.lang.Long.divideUnsigned(value, length)
      value = (value - length * s) & 0xFFFFFFFFL
      if (java.lang.Long.compareUnsigned(length, Ac.MinLength) < 0) renorm()
      s
    }

  def readInt(): Long = readBits(32)
}
