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
    val tc = org.apache.spark.sql.catalyst.FunctionIdentifier("token_count_in")
    if (!registry.functionExists(tc))
      registry.createOrReplaceTempFunction("token_count_in",
        (es: Seq[Expression]) => TokenCountIn(es.head, es(1)), "internal")
    val tl = org.apache.spark.sql.catalyst.FunctionIdentifier("token_len_sum")
    if (!registry.functionExists(tl))
      registry.createOrReplaceTempFunction("token_len_sum",
        (es: Seq[Expression]) => TokenLenSum(es.head), "internal")
    val bp = org.apache.spark.sql.catalyst.FunctionIdentifier("bigram_pairs")
    if (!registry.functionExists(bp))
      registry.createOrReplaceTempFunction("bigram_pairs",
        (es: Seq[Expression]) => BigramPairs(es.head), "internal")
    val cs = org.apache.spark.sql.catalyst.FunctionIdentifier("chunk_structs")
    if (!registry.functionExists(cs))
      registry.createOrReplaceTempFunction("chunk_structs",
        (es: Seq[Expression]) => ChunkStructs(es.head, es(1)), "internal")
    val cl = org.apache.spark.sql.catalyst.FunctionIdentifier("count_le")
    if (!registry.functionExists(cl))
      registry.createOrReplaceTempFunction("count_le",
        (es: Seq[Expression]) => CountLe(es.head, es(1)), "internal")
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

/** `token_count_in(ws, set)`: count of tokens equal to any member of a
  * LITERAL string set — the `size(filter(ws, w -> w IN (...)))` idiom
  * (stopword counting, language-marker scoring, literal-term tf) as
  * one hash-probe loop. The HOF spelling is CodegenFallback, so every
  * quality/langid/BM25 pass walked an interpreted lambda tree per
  * token (r9 standing-audit find). Semantics identical: null elements
  * never match (IN over a non-null set is null → filtered). */
case class TokenCountIn(child: Expression, set: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = set

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"token_count_in needs array<string>, got ${child.dataType}")
    else if (!set.dataType.isInstanceOf[ArrayType] ||
        set.dataType.asInstanceOf[ArrayType].elementType != StringType ||
        !set.foldable)
      TypeCheckResult.TypeCheckFailure(
        "token_count_in set must be a literal array<string>")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val setV: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val arr = set.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      // clone: literal UTF8Strings may back onto a shared buffer
      s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "token_count_in"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    TokenCountIn.count(x.asInstanceOf[ArrayData], setV)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) => {
      val ref = ctx.addReferenceObj("set", setV, "java.util.HashSet")
      s"${ev.value} = graft.functions.TokenCountIn.count($arr, $ref);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenCountIn =
    copy(child = newLeft, set = newRight)
}

object TokenCountIn {
  /** Shared JIT-compiled probe loop. */
  def count(arr: ArrayData,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Long = {
    var n = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1L
      i += 1
    }
    n
  }
}

/** `token_len_sum(ws)`: Σ length(w) over the row's tokens — the Gopher
  * mean-word-length numerator (`aggregate(ws, 0L, (a, w) -> a +
  * length(w))`) without the interpreted fold. `length` counts CHARS
  * (codepoints), exactly like the built-in; a null element nulls the
  * whole sum, matching the fold's null propagation. */
case class TokenLenSum(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"token_len_sum needs array<string>, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "token_len_sum"

  override protected def nullSafeEval(x: Any): Any =
    TokenLenSum.sum(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    // a NON-null input can still produce a null sum (null element →
    // fold's null propagation), so nullSafeCodeGen does not fit
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${c.isNull}) {
          java.lang.Long $boxed = graft.functions.TokenLenSum.sum(${c.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenLenSum =
    copy(child = newChild)
}

object TokenLenSum {
  /** Shared loop; null element → null total (the fold's semantics). */
  def sum(arr: ArrayData): java.lang.Long = {
    var s = 0L
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/** `bigram_pairs(ws)`: adjacent token pairs joined by one space —
  * `zip_with(slice(ws,1,n-1), slice(ws,2,n-1), (a,b) -> concat(a,' ',b))`
  * as one loop (n−1 output elements; empty below 2 tokens). The BPE /
  * phrase-mining pair-explode ran three interpreted collection
  * expressions per document. */
case class BigramPairs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bigram_pairs needs array<string>, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bigram_pairs"

  override protected def nullSafeEval(x: Any): Any =
    BigramPairs.pairs(x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.BigramPairs.pairs($arr);")

  override protected def withNewChildInternal(newChild: Expression): BigramPairs =
    copy(child = newChild)
}

object BigramPairs {
  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Shared loop; a null endpoint nulls that pair (concat semantics). */
  def pairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) =
        if (arr.isNullAt(i) || arr.isNullAt(i + 1)) null
        else org.apache.spark.unsafe.types.UTF8String.concat(
          arr.getUTF8String(i), SPACE, arr.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `chunk_structs(ws, width)`: the context-length split —
  * `transform(sequence(0, (n−1) div width), i -> struct(i, size(slice),
  * md5(array_join(slice, ' '))))` as one loop that streams each chunk's
  * token bytes into an incremental MD5 (no joined-string allocation).
  * Element-identical to the HOF spelling, including the 1-empty-chunk
  * degenerate row at n = 0 and the final short chunk. */
case class ChunkStructs(child: Expression, widthExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = widthExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
        child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_structs needs array<string>, got ${child.dataType}")
    else if (widthExpr.dataType != IntegerType || !widthExpr.foldable)
      TypeCheckResult.TypeCheckFailure("chunk_structs width must be an int literal")
    else if (widthV < 1)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_structs width must be >= 1, got $widthV")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val widthV: Int = widthExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("n_chunk_tokens", LongType, nullable = false),
    StructField("chunk_fp", StringType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "chunk_structs"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ChunkStructs.chunks(x.asInstanceOf[ArrayData], widthV)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, _) =>
      s"${ev.value} = graft.functions.ChunkStructs.chunks($arr, $widthV);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChunkStructs =
    copy(child = newLeft, widthExpr = newRight)
}

object ChunkStructs {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray
  private val SP: Byte = ' '.toByte

  /** Shared loop: one md5 per chunk, streamed token bytes. */
  def chunks(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    // `sequence(0, (n-1) div width)`: Spark div truncates toward zero,
    // so n = 0 still yields chunk 0 (an empty slice), like the HOF
    val nChunks = math.max((n - 1) / width, 0) + 1
    val out = new Array[Any](nChunks)
    val d = md.get()
    var c = 0
    while (c < nChunks) {
      val from = c * width
      val to = math.min(from + width, n)
      d.reset()
      // array_join skips NULL elements entirely — INCLUDING their
      // separator (join(['a', NULL, 'b']) = "a b", not "a  b") — so
      // the separator tracks the previous WRITTEN token, not position
      var wrote = false
      var i = from
      while (i < to) {
        if (!arr.isNullAt(i)) {
          if (wrote) d.update(SP)
          d.update(arr.getUTF8String(i).getBytes)
          wrote = true
        }
        i += 1
      }
      val dg = d.digest()
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = HEX((dg(j) >> 4) & 0xf)
        hex(2 * j + 1) = HEX(dg(j) & 0xf)
        j += 1
      }
      out(c) = org.apache.spark.sql.catalyst.InternalRow(
        c.toLong, (to - from).toLong,
        org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex)))
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** `count_le(cuts, v)`: how many LITERAL cut points are ≤ v — the
  * quantile-bucket index (`size(filter(cuts, c -> v >= c))`) without
  * the interpreted per-element lambda. Returns INT like `size`, and
  * matches the HOF's null semantics exactly: a NULL `v` makes the
  * lambda NULL for every cut, `filter` drops them all, `size` returns
  * 0 — so this expression is NEVER null (a null-propagating kernel
  * would mint a separate NULL bucket the spelling it replaces cannot
  * produce). */
case class CountLe(cuts: Expression, v: Expression)
    extends BinaryExpression {

  override def left: Expression = cuts
  override def right: Expression = v
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!cuts.dataType.isInstanceOf[ArrayType] ||
        cuts.dataType.asInstanceOf[ArrayType].elementType != LongType ||
        !cuts.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"count_le needs a literal array<bigint> cuts, got ${cuts.dataType}")
    else if (v.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"count_le needs a bigint value, got ${v.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val cutArr: Array[Long] =
    cuts.eval().asInstanceOf[ArrayData].toLongArray()

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_le"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val value = v.eval(input)
    if (value == null) 0
    else {
      val l = value.asInstanceOf[Long]
      var n = 0
      var i = 0
      while (i < cutArr.length) {
        if (cutArr(i) <= l) n += 1
        i += 1
      }
      n
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = v.genCode(ctx)
    val ref = ctx.addReferenceObj("cuts", cutArr, "long[]")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    ev.copy(isNull =
      org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      code = code"""
        ${c.code}
        int $n = 0;
        if (!${c.isNull}) {
          for (int $i = 0; $i < ${cutArr.length}; $i++) {
            if ($ref[$i] <= ${c.value}) $n++;
          }
        }
        int ${ev.value} = $n;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountLe =
    copy(cuts = newLeft, v = newRight)
}
