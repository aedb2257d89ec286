package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Native HyperLogLog register sketch as a `TypedImperativeAggregate` —
  * the aggregate-function analog of [[graft.sim.FloatVecDot]]'s scalar
  * tier: where the SQL-composed HLL
  * ([[graft.events.EventOps.hllUsers]]) needs TWO keyed aggregations
  * ((group, bucket) max-rho, then the per-group fold), the native
  * aggregate carries all 64 registers as a single 64-byte buffer, so a
  * grouped sketch is ONE exchange whose shuffled state is 64 bytes per
  * (partition, group) regardless of cardinality — the textbook sketch
  * merge, exactly how engine-native approx-distincts execute.
  *
  * The math is bit-identical to the SQL twin (same md5-derived 28-bit
  * hash domain, 6-bit bucket, rho of the 22-bit tail, order-free integer
  * harmonic `sum(2^(23 - M_j))`), so the SAME DuckDB oracle gates both
  * paths, and the estimate helper applies unchanged.
  *
  * Input: the 28-bit hash as a LONG (hashing stays in the query plan —
  * codegen'd md5 — keeping the aggregate itself pure register algebra).
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  import HllSketchAgg._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch needs a bigint hash input, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("used_buckets", LongType, nullable = false),
    StructField("harmonic_scaled", LongType, nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](Buckets)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = ((h >>> TailBits) & (Buckets - 1)).toInt
      val tail = h & (TailMod - 1)
      // rho = 23 - bit_length(tail); tail < 2^22 so rho in [1, 23]
      val rho = (TailBits + 1) - (64 - java.lang.Long.numberOfLeadingZeros(tail))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Buckets) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var used = 0L
    var harmonic = 0L
    var i = 0
    while (i < Buckets) {
      if (buf(i) > 0) used += 1
      harmonic += 1L << (TailBits + 1 - buf(i))
      i += 1
    }
    InternalRow(used, harmonic)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

object HllSketchAgg {
  /** Same register geometry as [[graft.events.EventOps]]'s SQL twin:
    * m=64 registers over a 28-bit hash, 22-bit tails. */
  val Buckets: Int = 64
  val TailBits: Int = 22
  val TailMod: Long = 1L << TailBits

  /** Register `hll_sketch` in the session's function registry
    * (idempotent) — the analyzer wraps the bare [[HllSketchAgg]] in an
    * AggregateExpression like any built-in aggregate. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("hll_sketch")
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction(
        "hll_sketch",
        (exprs: Seq[Expression]) => HllSketchAgg(exprs.head),
        "internal")
  }
}
