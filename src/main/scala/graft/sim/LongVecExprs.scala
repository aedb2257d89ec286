package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd int64 vector kernels — the same (c)-tier custom
  * Expression path as [[FloatVecDot]]/[[NearestCell]], for the same
  * reason: Spark's higher-order functions (`aggregate`, `zip_with`,
  * `transform`) are CodegenFallback, so a per-row HOF distance over a
  * corpus-sized scan runs INTERPRETED no matter how hot the query.
  * Each kernel is a tight primitive loop with identical integer
  * arithmetic to the HOF spelling it replaces — spec-pinned equal, so
  * the DuckDB oracles never move. */

/** `Σ ((a[i] − b[i]) · w[i])²` — the SQ8 asymmetric-distance (ADC)
  * kernel over two code arrays with literal per-dimension weights
  * (`w = rng`, clearing the dequantization denominators exactly; see
  * [[Sq8]]). */
case class LongVecSqDistW(a: Expression, b: Expression, w: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = w

  private def isLongArr(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArr(a.dataType) || !isLongArr(b.dataType) || !isLongArr(w.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"sq8_adc_dist needs three array<bigint>, got " +
          s"${a.dataType} / ${b.dataType} / ${w.dataType}")
    else if (!w.foldable)
      TypeCheckResult.TypeCheckFailure("sq8_adc_dist weights must be literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val wArr: Array[Long] =
    w.eval().asInstanceOf[ArrayData].toLongArray()

  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_adc_dist"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    val bv = y.asInstanceOf[ArrayData]
    LongVecExprs.checkLen(av.numElements(), wArr.length, "sq8_adc_dist")
    LongVecExprs.checkLen(bv.numElements(), wArr.length, "sq8_adc_dist")
    var s = 0L
    var i = 0
    while (i < wArr.length) {
      val d = (av.getLong(i) - bv.getLong(i)) * wArr(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, _) => {
      val wRef = ctx.addReferenceObj("wArr", wArr, "long[]")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |graft.sim.LongVecExprs.checkLen($av.numElements(), ${wArr.length}, "sq8_adc_dist");
         |graft.sim.LongVecExprs.checkLen($bv.numElements(), ${wArr.length}, "sq8_adc_dist");
         |long $s = 0L;
         |for (int $i = 0; $i < ${wArr.length}; $i++) {
         |  long $d = ($av.getLong($i) - $bv.getLong($i)) * $wRef[$i];
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LongVecSqDistW =
    copy(a = newFirst, b = newSecond, w = newThird)
}

/** `Σ (a[i] − shift) · q[i]` over a literal query vector — the centered
  * integer dot ([[Sq8.rangeSearch]]/[[Sq8.hardNegatives]] similarity;
  * `shift` folds the quantization center out of the scanned column). */
case class LongVecCenterDot(a: Expression, q: Expression, shift: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = q
  override def third: Expression = shift

  private def isLongArr(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArr(a.dataType) || !isLongArr(q.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"center_dot needs array<bigint> vectors, got ${a.dataType} / ${q.dataType}")
    else if (shift.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"center_dot needs a bigint shift, got ${shift.dataType}")
    else if (!q.foldable || !shift.foldable)
      TypeCheckResult.TypeCheckFailure(
        "center_dot query vector and shift must be literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val qArr: Array[Long] =
    q.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val shiftV: Long =
    shift.eval().asInstanceOf[Long]

  override def dataType: DataType = LongType
  override def prettyName: String = "center_dot"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    LongVecExprs.checkLen(av.numElements(), qArr.length, "center_dot")
    var s = 0L
    var i = 0
    while (i < qArr.length) {
      s += (av.getLong(i) - shiftV) * qArr(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, _, _) => {
      val qRef = ctx.addReferenceObj("qArr", qArr, "long[]")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |graft.sim.LongVecExprs.checkLen($av.numElements(), ${qArr.length}, "center_dot");
         |long $s = 0L;
         |for (int $i = 0; $i < ${qArr.length}; $i++) {
         |  $s += ($av.getLong($i) - ${shiftV}L) * $qRef[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LongVecCenterDot =
    copy(a = newFirst, q = newSecond, shift = newThird)
}

/** `round((a[i] + shift) · scale)` per element, array<float> →
  * array<bigint> — the scan-side quantization step ([[Ivf.quantized]]).
  * This was the LAST higher-order function on a corpus-scan hot path
  * (`transform` + per-element `round`, both interpreted): every IVF
  * assignment, Lloyd training step, and PQ/SQ8 encode pass paid it on
  * every row.
  *
  * Rounding contract: `Math.round`, which equals Spark's
  * `round(..., 0)` (BigDecimal HALF_UP on the shortest-decimal form)
  * and DuckDB's `round` (half away from zero) whenever the scaled
  * value is positive and exactly representable — guaranteed here
  * because inputs are float32 (≤24-bit mantissa), `shift` makes them
  * positive, and `scale` is a power of two ([[Ivf.Scale]] = 2^20), so
  * every product is an exact small-fraction multiple, never the
  * `0.49999999999999994` pathological zone. The three-way agreement is
  * spec-pinned over the real corpus and both oracle SFs re-verify it. */
case class FloatVecQuantize(a: Expression, shift: Expression, scale: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = shift
  override def third: Expression = scale

  override def checkInputDataTypes(): TypeCheckResult =
    if (!a.dataType.isInstanceOf[ArrayType] ||
        a.dataType.asInstanceOf[ArrayType].elementType != FloatType)
      TypeCheckResult.TypeCheckFailure(
        s"fvec_quantize needs array<float>, got ${a.dataType}")
    else if (shift.dataType != DoubleType || scale.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"fvec_quantize needs double shift/scale, got " +
          s"${shift.dataType} / ${scale.dataType}")
    else if (!shift.foldable || !scale.foldable)
      TypeCheckResult.TypeCheckFailure("fvec_quantize shift/scale must be literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val shiftV: Double = shift.eval().asInstanceOf[Double]
  @transient private lazy val scaleV: Double = scale.eval().asInstanceOf[Double]

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fvec_quantize"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    val n = av.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Math.round((av.getFloat(i).toDouble + shiftV) * scaleV)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, _, _) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $av.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = Math.round(((double) $av.getFloat($i) + ${shiftV}D) * ${scaleV}D);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): FloatVecQuantize =
    copy(a = newFirst, shift = newSecond, scale = newThird)
}

/** `sq8_encode(qv, mns, rngs)`: per-dimension scalar quantization to a
  * byte code — `least((qv[i] − mn[i]) · 255 div rng[i], 255)` — as ONE
  * tight loop over literal range arrays. The chained `zip_with`
  * spelling this replaces is CodegenFallback ([[Sq8.cdExpr]]'s old
  * form): every SQ8 encode pass walked two interpreted lambda trees
  * per corpus row (the r9 standing-audit find). Identical all-integer
  * arithmetic (Java `/` and Spark `div` both truncate toward zero, and
  * the differences are non-negative by construction — mn is the corpus
  * minimum), spec-pinned element-identical in `PqSpec`'s SQ8 suite. */
case class LongVecSq8Encode(a: Expression, mns: Expression, rngs: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = mns
  override def third: Expression = rngs

  private def isLongArr(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArr(a.dataType) || !isLongArr(mns.dataType) ||
        !isLongArr(rngs.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"sq8_encode needs three array<bigint>, got " +
          s"${a.dataType} / ${mns.dataType} / ${rngs.dataType}")
    else if (!mns.foldable || !rngs.foldable)
      TypeCheckResult.TypeCheckFailure("sq8_encode ranges must be literal")
    else if (mnArr.length != rgArr.length)
      TypeCheckResult.TypeCheckFailure(
        s"sq8_encode: ${mnArr.length} mins vs ${rgArr.length} ranges")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val mnArr: Array[Long] =
    mns.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val rgArr: Array[Long] =
    rngs.eval().asInstanceOf[ArrayData].toLongArray()

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    LongVecSq8Encode.encode(x.asInstanceOf[ArrayData], mnArr, rgArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, _, _) => {
      val mnRef = ctx.addReferenceObj("mns", mnArr, "long[]")
      val rgRef = ctx.addReferenceObj("rngs", rgArr, "long[]")
      s"${ev.value} = graft.sim.LongVecSq8Encode.encode($av, $mnRef, $rgRef);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LongVecSq8Encode =
    copy(a = newFirst, mns = newSecond, rngs = newThird)
}

object LongVecSq8Encode {
  /** Shared JIT-compiled loop (TextKernels pattern). */
  def encode(v: ArrayData, mns: Array[Long], rngs: Array[Long]): ArrayData = {
    LongVecExprs.checkLen(v.numElements(), mns.length, "sq8_encode")
    val out = new Array[Long](mns.length)
    var i = 0
    while (i < mns.length) {
      out(i) = math.min((v.getLong(i) - mns(i)) * 255L / rngs(i), 255L)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `sq8_ub(cd, qcv, rngs, bases)`: the SQ8 range-search prescreen
  * upper bound — for each dimension the dequantization interval edge
  * that MAXIMIZES `qcv_i · x_i` (the high edge when `qcv_i ≥ 0`, the
  * low edge otherwise), summed — as ONE expression evaluated once per
  * row. The unrolled 64-term `element_at(cd, i)` spelling this
  * replaces referenced the code array 64 times, which let predicate
  * pushdown substitute the encode expression into EVERY reference —
  * 64 encodes per scanned row (measured 0.7 → 1.7 s when the encode
  * became a pushable native call; the r9 plan-audit find). `bases` is
  * `mns − Center` precomputed driver-side; identical truncating
  * integer division on non-negative operands. */
case class LongVecSq8Ub(cd: Expression, qcv: Expression, rngs: Expression,
    bases: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(cd, qcv, rngs, bases)
  override def nullable: Boolean = cd.nullable
  override def foldable: Boolean = false

  private def isLongArr(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(c => isLongArr(c.dataType)))
      TypeCheckResult.TypeCheckFailure(
        s"sq8_ub needs four array<bigint>, got " +
          children.map(_.dataType).mkString(" / "))
    else if (!qcv.foldable || !rngs.foldable || !bases.foldable)
      TypeCheckResult.TypeCheckFailure(
        "sq8_ub query/range/base arrays must be literal")
    else if (qArr.length != rgArr.length || qArr.length != bsArr.length)
      TypeCheckResult.TypeCheckFailure(
        s"sq8_ub: mismatched literal lengths ${qArr.length}/" +
          s"${rgArr.length}/${bsArr.length}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val qArr: Array[Long] =
    qcv.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val rgArr: Array[Long] =
    rngs.eval().asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val bsArr: Array[Long] =
    bases.eval().asInstanceOf[ArrayData].toLongArray()

  override def dataType: DataType = LongType
  override def prettyName: String = "sq8_ub"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = cd.eval(input)
    if (v == null) null
    else LongVecSq8Ub.ub(v.asInstanceOf[ArrayData], qArr, rgArr, bsArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = cd.genCode(ctx)
    val qRef = ctx.addReferenceObj("qcv", qArr, "long[]")
    val rRef = ctx.addReferenceObj("rngs", rgArr, "long[]")
    val bRef = ctx.addReferenceObj("bases", bsArr, "long[]")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.sim.LongVecSq8Ub.ub(${c.value}, $qRef, $rRef, $bRef);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVecSq8Ub =
    copy(cd = newChildren(0), qcv = newChildren(1), rngs = newChildren(2),
      bases = newChildren(3))
}

object LongVecSq8Ub {
  /** Shared JIT-compiled loop; Java `/` == Spark `div` here (all
    * division operands are non-negative by construction). */
  def ub(cdv: ArrayData, qcv: Array[Long], rngs: Array[Long],
      bases: Array[Long]): Long = {
    LongVecExprs.checkLen(cdv.numElements(), qcv.length, "sq8_ub")
    var s = 0L
    var i = 0
    while (i < qcv.length) {
      val cdi = cdv.getLong(i)
      val edge =
        if (qcv(i) >= 0) bases(i) + ((cdi + 1L) * rngs(i)) / 255L
        else bases(i) + (cdi * rngs(i) + 254L) / 255L
      s += qcv(i) * edge
      i += 1
    }
    s
  }
}

object LongVecExprs {
  /** Runtime domain check shared by eval and codegen: the kernels are
    * session-REGISTERED SQL functions that loop to the literal side's
    * length, so a SQL caller passing a shorter row-side array would
    * read UnsafeArrayData out of bounds — silent garbage. Array lengths
    * are data, not types, so this is the row-time counterpart of
    * [[graft.functions.Md5Prefix]]'s analysis-time domain validation. */
  def checkLen(actual: Int, expected: Int, fn: String): Unit =
    if (actual < expected) throw new IllegalArgumentException(
      s"$fn: row-side array has $actual elements, expected >= $expected")

  /** proj_sqdist's domain: the b vector must cover a's length, and the
    * sign matrix must hold whole rows of that length. */
  def checkProjDim(bLen: Int, dim: Int, sLen: Int): Unit = {
    if (dim <= 0 || sLen % dim != 0) throw new IllegalArgumentException(
      s"proj_sqdist: sign matrix of $sLen elements is not a whole number " +
        s"of rows of the input dimension $dim")
    checkLen(bLen, dim, "proj_sqdist")
  }

  /** Register the kernels in the session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val adc = org.apache.spark.sql.catalyst.FunctionIdentifier("sq8_adc_dist")
    if (!registry.functionExists(adc))
      registry.createOrReplaceTempFunction("sq8_adc_dist",
        (es: Seq[Expression]) => LongVecSqDistW(es.head, es(1), es(2)),
        "internal")
    val cd = org.apache.spark.sql.catalyst.FunctionIdentifier("center_dot")
    if (!registry.functionExists(cd))
      registry.createOrReplaceTempFunction("center_dot",
        (es: Seq[Expression]) => LongVecCenterDot(es.head, es(1), es(2)),
        "internal")
    val pj = org.apache.spark.sql.catalyst.FunctionIdentifier("proj_sqdist")
    if (!registry.functionExists(pj))
      registry.createOrReplaceTempFunction("proj_sqdist",
        (es: Seq[Expression]) => LongVecProjSqDist(es.head, es(1), es(2)),
        "internal")
    val fq = org.apache.spark.sql.catalyst.FunctionIdentifier("fvec_quantize")
    if (!registry.functionExists(fq))
      registry.createOrReplaceTempFunction("fvec_quantize",
        (es: Seq[Expression]) => FloatVecQuantize(es.head, es(1), es(2)),
        "internal")
    val se = org.apache.spark.sql.catalyst.FunctionIdentifier("sq8_encode")
    if (!registry.functionExists(se))
      registry.createOrReplaceTempFunction("sq8_encode",
        (es: Seq[Expression]) => LongVecSq8Encode(es.head, es(1), es(2)),
        "internal")
    val ub = org.apache.spark.sql.catalyst.FunctionIdentifier("sq8_ub")
    if (!registry.functionExists(ub))
      registry.createOrReplaceTempFunction("sq8_ub",
        (es: Seq[Expression]) => LongVecSq8Ub(es.head, es(1), es(2), es(3)),
        "internal")
  }
}

/** `Σ_r (Σ_i (a[i] − b[i]) · s[r·dim + i])²` — the JL projected squared
  * L2 distance over a literal row-major ±1 sign matrix
  * ([[Rproj.topK]]'s shortlist ranking; the row count derives from the
  * matrix size and the input vector's length at run time). */
case class LongVecProjSqDist(a: Expression, b: Expression, s: Expression)
    extends TernaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = s

  private def isLongArr(dt: DataType) = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isLongArr(a.dataType) || !isLongArr(b.dataType) || !isLongArr(s.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"proj_sqdist needs three array<bigint>, got " +
          s"${a.dataType} / ${b.dataType} / ${s.dataType}")
    else if (!s.foldable)
      TypeCheckResult.TypeCheckFailure("proj_sqdist sign matrix must be literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val sArr: Array[Long] =
    s.eval().asInstanceOf[ArrayData].toLongArray()

  override def dataType: DataType = LongType
  override def prettyName: String = "proj_sqdist"

  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any = {
    val av = x.asInstanceOf[ArrayData]
    val bv = y.asInstanceOf[ArrayData]
    val dim = av.numElements()
    LongVecExprs.checkProjDim(bv.numElements(), dim, sArr.length)
    val rdim = sArr.length / dim
    var sum = 0L
    var r = 0
    while (r < rdim) {
      var t = 0L
      val base = r * dim
      var i = 0
      while (i < dim) {
        t += (av.getLong(i) - bv.getLong(i)) * sArr(base + i)
        i += 1
      }
      sum += t * t
      r += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, _) => {
      val sRef = ctx.addReferenceObj("sArr", sArr, "long[]")
      val sum = ctx.freshName("sum")
      val dim = ctx.freshName("dim")
      val rdim = ctx.freshName("rdim")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val base = ctx.freshName("base")
      s"""
         |long $sum = 0L;
         |int $dim = $av.numElements();
         |graft.sim.LongVecExprs.checkProjDim($bv.numElements(), $dim, ${sArr.length});
         |int $rdim = ${sArr.length} / $dim;
         |for (int $r = 0; $r < $rdim; $r++) {
         |  long $t = 0L;
         |  int $base = $r * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $t += ($av.getLong($i) - $bv.getLong($i)) * $sRef[$base + $i];
         |  }
         |  $sum += $t * $t;
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): LongVecProjSqDist =
    copy(a = newFirst, b = newSecond, s = newThird)
}
