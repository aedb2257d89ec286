package graft.sources.las.laz

/** Prediction-residual coder on top of the arithmetic coder: a corrector
  * `real - pred` is coded as (a) the index `k` of the tightest interval
  * `[-(2^k - 1), 2^k]` containing it, via a per-context adaptive model,
  * then (b) its position inside that interval — fully modeled for small
  * `k`, split into modeled-high/raw-low bits above `bitsHigh`. This is
  * the public LASzip corrector layout; every LAZ item codec drives one
  * or more of these.
  *
  * One instance serves either encoding or decoding (pass the side you
  * have; the model state layout is identical).
  */
final class IntegerCompressor(
    enc: ArithmeticEncoder,
    dec: ArithmeticDecoder,
    bits: Int,
    contexts: Int,
    bitsHigh: Int = 8) {

  private val corrBits: Int = if (bits > 0 && bits < 32) bits else 32
  private val corrRange: Long = if (bits > 0 && bits < 32) 1L << bits else 0L
  private val corrMin: Int =
    if (corrRange != 0) -(corrRange / 2).toInt else Int.MinValue
  private val corrMax: Int =
    if (corrRange != 0) corrMin + corrRange.toInt - 1 else Int.MaxValue

  private val forDecoder = dec != null
  private val mBits: Array[ArithmeticModel] =
    Array.fill(contexts)(new ArithmeticModel(corrBits + 1, forDecoder))
  private val mCorrectorBit = new ArithmeticBitModel
  private val mCorrector: Array[ArithmeticModel] =
    (1 to corrBits).map(k =>
      new ArithmeticModel(if (k <= bitsHigh) 1 << k else 1 << bitsHigh, forDecoder)).toArray

  /** Interval index of the last corrector coded — POINT10 uses the x-delta
    * k as context for y, and x+y for z. */
  var k: Int = 0

  def compress(pred: Int, real: Int, context: Int = 0): Unit = {
    var corr = real - pred
    if (corrRange != 0) {
      if (corr < corrMin) corr += corrRange.toInt
      else if (corr > corrMax) corr -= corrRange.toInt
    }
    writeCorrector(corr, mBits(context))
  }

  def decompress(pred: Int, context: Int = 0): Int = {
    var real = pred + readCorrector(mBits(context))
    // the corrector was wrapped into [corrMin, corrMax]; the decoded value
    // wraps back into the unsigned ring [0, corrRange)
    if (corrRange != 0) {
      if (real < 0) real += corrRange.toInt
      else if (real >= corrRange) real -= corrRange.toInt
    }
    real
  }

  private def writeCorrector(cIn: Int, model: ArithmeticModel): Unit = {
    var c = cIn
    // tightest interval [-(2^k - 1), 2^k] containing c
    k = 0
    var c1 = if (c <= 0) -c else c - 1
    while (c1 != 0) { c1 >>>= 1; k += 1 }
    enc.encodeSymbol(model, k)
    if (k != 0) {
      if (k < 32) {
        // translate c into [0, 2^k - 1]
        if (c >= 0) c -= 1 // c was in [2^(k-1) + 1, 2^k]
        else c += (1 << k) - 1 // c was in [-(2^k - 1), -2^(k-1)]
        if (k <= bitsHigh) {
          enc.encodeSymbol(mCorrector(k - 1), c)
        } else {
          val k1 = k - bitsHigh
          val cLow = c & ((1 << k1) - 1)
          enc.encodeSymbol(mCorrector(k - 1), c >>> k1)
          enc.writeBits(k1, cLow.toLong & 0xFFFFFFFFL)
        }
      }
      // k == 32: corrector is corrMin, nothing more to write
    } else {
      enc.encodeBit(mCorrectorBit, c) // c is 0 or 1
    }
  }

  private def readCorrector(model: ArithmeticModel): Int = {
    k = dec.decodeSymbol(model)
    if (k != 0) {
      if (k < 32) {
        var c =
          if (k <= bitsHigh) dec.decodeSymbol(mCorrector(k - 1))
          else {
            val k1 = k - bitsHigh
            val hi = dec.decodeSymbol(mCorrector(k - 1))
            val lo = dec.readBits(k1).toInt
            (hi << k1) | lo
          }
        // translate back out of [0, 2^k - 1]
        if (c >= (1 << (k - 1))) c += 1
        else c -= (1 << k) - 1
        c
      } else corrMin
    } else dec.decodeBit(mCorrectorBit)
  }
}
