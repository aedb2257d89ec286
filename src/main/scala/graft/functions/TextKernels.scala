package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-document text-sketch kernels — the same (c)-tier custom
  * Expression path as [[Md5Prefix]]/`NearestCell`, for the same reason:
  * the array spellings (`transform(sequence(...), i -> md5_prefix(
  * concat_ws(' ', slice(ws, ...))))`) are higher-order functions, which
  * Spark evaluates as CodegenFallback — the hottest map stage of the
  * text surface (corpus-wide k-gram hashing) ran INTERPRETED, paying an
  * expression-tree walk per k-gram on top of the digest. Each kernel
  * here is one tight loop over the row's token bytes with an
  * incremental thread-local MD5 (no joined-string allocation at all),
  * spec-pinned element-identical to the HOF spelling it replaces, so
  * the DuckDB oracles never move. */
object TextKernels {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val SP: Byte = ' '.toByte

  /** Top 60 bits of md5 of tokens `[from, from+k)` joined by ' ' — the
    * exact value of `md5_prefix(concat_ws(' ', slice(...)), 1, 15)`,
    * computed by streaming the token bytes into the digest. */
  private def hash60(toks: Array[Array[Byte]], from: Int, k: Int): Long = {
    val d = md.get()
    d.reset()
    var i = from
    while (i < from + k) {
      if (i > from) d.update(SP)
      d.update(toks(i))
      i += 1
    }
    val dg = d.digest()
    var hi = 0L
    var j = 0
    while (j < 8) { hi = (hi << 8) | (dg(j) & 0xffL); j += 1 }
    hi >>> 4 // bits [0, 60) of the digest
  }

  private def tokenBytes(arr: ArrayData): Array[Array[Byte]] = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    toks
  }

  /** Distinct 60-bit k-gram hashes in first-occurrence order (the
    * `array_distinct` contract of the shingle spelling). Rows shorter
    * than k yield an empty array. */
  def kgramHashes(arr: ArrayData, k: Int): ArrayData = {
    val toks = tokenBytes(arr)
    val m = toks.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var cnt = 0
    var p = 0
    while (p < m) {
      val h = hash60(toks, p, k)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** Winnowing minima: hash every k-gram, slide a w-window over the
    * hash sequence, emit each complete window's minimum (one per
    * window, duplicates preserved — the consumer counts windows per
    * fingerprint). Rows with fewer than k+w-1 tokens yield an empty
    * array, matching the oracle's complete-window filter. */
  def winnowMins(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val toks = tokenBytes(arr)
    val m = toks.length - k + 1
    if (m < w) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var p = 0
    while (p < m) { hs(p) = hash60(toks, p, k); p += 1 }
    val out = new Array[Long](m - w + 1)
    p = w - 1
    while (p < m) {
      var mn = hs(p - w + 1)
      var q = p - w + 2
      while (q <= p) { if (hs(q) < mn) mn = hs(q); q += 1 }
      out(p - w + 1) = mn
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Register `kgram_hashes(ws, k)` / `winnow_mins(ws, k, w)` in the
    * session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val kg = org.apache.spark.sql.catalyst.FunctionIdentifier("kgram_hashes")
    if (!registry.functionExists(kg))
      registry.createOrReplaceTempFunction("kgram_hashes",
        (es: Seq[Expression]) => KgramHashes(es.head, es(1)), "internal")
    val wm = org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_mins")
    if (!registry.functionExists(wm))
      registry.createOrReplaceTempFunction("winnow_mins",
        (es: Seq[Expression]) => WinnowMins(es.head, es(1), es(2)), "internal")
  }
}

/** `kgram_hashes(ws, k)`: distinct 60-bit md5-prefix hashes of the
  * row's k-gram strings, first-occurrence order. */
case class KgramHashes(child: Expression, kExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = kExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"kgram_hashes needs array<string>, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kgram_hashes k must be an int literal")
    else if (kV < 1)
      TypeCheckResult.TypeCheckFailure(s"kgram_hashes k must be >= 1, got $kV")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val kV: Int = kExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kgram_hashes"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    TextKernels.kgramHashes(x.asInstanceOf[ArrayData], kV)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) =>
      s"${ev.value} = graft.functions.TextKernels.kgramHashes($arr, $kV);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KgramHashes =
    copy(child = newLeft, kExpr = newRight)
}

/** `winnow_mins(ws, k, w)`: per-complete-window minima of the k-gram
  * hash sequence (Schleimer/Wilkerson/Aiken winnowing selection). */
case class WinnowMins(child: Expression, kExpr: Expression, wExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = wExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_mins needs array<string>, got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || wExpr.dataType != IntegerType ||
        !kExpr.foldable || !wExpr.foldable)
      TypeCheckResult.TypeCheckFailure("winnow_mins k/w must be int literals")
    else if (kV < 1 || wV < 1)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_mins k/w must be >= 1, got $kV/$wV")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val kV: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val wV: Int = wExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    TextKernels.winnowMins(x.asInstanceOf[ArrayData], kV, wV)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _, _) =>
      s"${ev.value} = graft.functions.TextKernels.winnowMins($arr, $kV, $wV);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): WinnowMins =
    copy(child = newFirst, kExpr = newSecond, wExpr = newThird)
}
