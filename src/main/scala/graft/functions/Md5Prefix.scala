package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(x), start, n), 16, 10)` as ONE native kernel:
  * MD5 digest → big-endian bit slice → int64, skipping the 32-char hex
  * string, the substring copy, and `conv`'s per-char radix parse that
  * the composed spelling allocates on EVERY call. The md5-prefix hash
  * is the library's universal exact-across-engines hash (shingles,
  * tokens, lines, fingerprints, buckets — the DuckDB oracles compute
  * the identical `CAST('0x'||substr(md5(..)..) AS BIGINT)`), so this
  * single expression sits under most text/dedup scans; the hex prefix
  * of `n` chars at 1-based char `start` is exactly bits
  * `[(start−1)·4, (start−1+n)·4)` of the digest, which [[Md5Prefix]]
  * extracts with two shifts. `n ≤ 15` keeps the value positive in an
  * int64, matching `conv`'s domain as used here.
  *
  * The digest instance is thread-local — `DigestUtils.md5Hex` (what
  * Spark's `md5` calls) does a `MessageDigest.getInstance` lookup per
  * row on top of the hex encode. */
case class Md5Prefix(child: Expression, start: Expression, n: Expression)
    extends TernaryExpression {

  override def first: Expression = child
  override def second: Expression = start
  override def third: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType && child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"md5_prefix needs string or binary input, got ${child.dataType}")
    else if (start.dataType != IntegerType || n.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("md5_prefix start/n must be int")
    else if (!start.foldable || !n.foldable)
      TypeCheckResult.TypeCheckFailure("md5_prefix start/n must be literal")
    else {
      val (s, k) = (startV, nV)
      if (s < 1 || k < 1 || k > 15 || (s - 1) + k > 32)
        TypeCheckResult.TypeCheckFailure(
          s"md5_prefix slice [$s, $s+$k) out of the 32-hex-char/positive-int64 domain")
      else TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val startV: Int = start.eval().asInstanceOf[Int]
  @transient private lazy val nV: Int = n.eval().asInstanceOf[Int]

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any = {
    val bytes = x match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Md5Prefix.digestBits(bytes, (startV - 1) * 4, nV * 4)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (in, _, _) => {
      val bytes =
        if (child.dataType == StringType) s"$in.getBytes()" else in
      s"${ev.value} = graft.functions.Md5Prefix.digestBits(" +
        s"$bytes, ${(startV - 1) * 4}, ${nV * 4});"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Md5Prefix =
    copy(child = newFirst, start = newSecond, n = newThird)
}

object Md5Prefix {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def read8(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Bits `[bitOffset, bitOffset + nbits)` of md5(bytes), big-endian —
    * the value of the hex-prefix slice. `nbits ≤ 60` (callers pass
    * `n ≤ 15` hex chars). */
  def digestBits(bytes: Array[Byte], bitOffset: Int, nbits: Int): Long = {
    val d = md.get().digest(bytes) // digest() resets the instance
    val hi = read8(d, 0)
    val lo = read8(d, 8)
    val mask = (1L << nbits) - 1
    val end = bitOffset + nbits
    if (end <= 64) (hi >>> (64 - end)) & mask
    else if (bitOffset >= 64) (lo >>> (128 - end)) & mask
    else ((hi << (end - 64)) | (lo >>> (128 - end))) & mask
  }

  /** Register `md5_prefix` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("md5_prefix")
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction("md5_prefix",
        (es: Seq[Expression]) => Md5Prefix(es.head, es(1), es(2)),
        "internal")
  }
}
