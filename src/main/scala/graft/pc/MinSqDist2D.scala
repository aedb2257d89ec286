package graft.pc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd "squared distance to the nearest of K literal 2-D
  * points": `min_k (x - us[k])² + (y - vs[k])²` as a tight primitive
  * LOOP over reference arrays.
  *
  * Why an expression and not `least(...)` over K unrolled terms: the
  * registration sweep evaluates this for 12 rotations × 16 model points
  * per row, and the unrolled form puts ~2300 straight-line operations
  * into one whole-stage-codegen method. Janino compiles it, but the
  * method blows past HotSpot's JIT compilation limit, so the stage
  * executes as INTERPRETED bytecode — measured 23 s where the loop form
  * runs 0.9 s on the same 600k-point scan (and the pre-split
  * explode-per-angle shape was 246 s). Same (c)-tier custom-Expression
  * path as [[graft.sim.FloatVecDot]], for the same reason: the built-in
  * spelling cannot express a compiled loop.
  *
  * Semantics match the `least((x-u0)*(x-u0)+(y-v0)*(y-v0), …)` spelling
  * EXACTLY: each term is the identical IEEE expression tree and min is
  * order-free on NaN-free doubles, so swapping implementations cannot
  * change oracle-compared results (pinned by `RetrievalOpsSpec`).
  *
  * The model arrays arrive as FOLDABLE array<double> literals (so the
  * function is registry-callable); they are materialized once driver-side
  * and embedded as reference arrays in the generated code.
  */
case class MinSqDist2D(x: Expression, y: Expression,
    us: Expression, vs: Expression) extends QuaternaryExpression {

  override def first: Expression = x
  override def second: Expression = y
  override def third: Expression = us
  override def fourth: Expression = vs

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (x.dataType != DoubleType || y.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"pc_min_sqdist2 needs double x/y, got ${x.dataType} / ${y.dataType}")
    else if (!isDoubleArr(us.dataType) || !isDoubleArr(vs.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"pc_min_sqdist2 needs array<double> model points, got ${us.dataType} / ${vs.dataType}")
    else if (!us.foldable || !vs.foldable)
      TypeCheckResult.TypeCheckFailure(
        "pc_min_sqdist2 model points must be literals")
    else if (usArr.length != vsArr.length || usArr.isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"pc_min_sqdist2 model arrays must be same-length and non-empty " +
          s"(got ${usArr.length} / ${vsArr.length})")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val usArr: Array[Double] =
    us.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val vsArr: Array[Double] =
    vs.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pc_min_sqdist2"

  override protected def nullSafeEval(a: Any, b: Any, u: Any, v: Any): Any = {
    val px = a.asInstanceOf[Double]
    val py = b.asInstanceOf[Double]
    var m = Double.PositiveInfinity
    var k = 0
    while (k < usArr.length) {
      val dx = px - usArr(k)
      val dy = py - vsArr(k)
      val d = dx * dx + dy * dy
      if (d < m) m = d
      k += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, _, _) => {
      val usRef = ctx.addReferenceObj("usArr", usArr, "double[]")
      val vsRef = ctx.addReferenceObj("vsArr", vsArr, "double[]")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val dx = ctx.freshName("dx")
      val dy = ctx.freshName("dy")
      val d = ctx.freshName("d")
      s"""
         |double $m = Double.POSITIVE_INFINITY;
         |for (int $k = 0; $k < ${usArr.length}; $k++) {
         |  double $dx = $a - $usRef[$k];
         |  double $dy = $b - $vsRef[$k];
         |  double $d = $dx * $dx + $dy * $dy;
         |  if ($d < $m) $m = $d;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): MinSqDist2D =
    copy(x = newFirst, y = newSecond, us = newThird, vs = newFourth)
}

object MinSqDist2D {
  /** Register `pc_min_sqdist2` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("pc_min_sqdist2")
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        "pc_min_sqdist2",
        (exprs: Seq[Expression]) =>
          MinSqDist2D(exprs.head, exprs(1), exprs(2), exprs(3)),
        "internal")
  }
}
