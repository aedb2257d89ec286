package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a `TypedImperativeAggregate` —
  * the second native aggregate tier next to [[HllSketchAgg]]: ONE
  * exchange whose shuffled state is at most `k` counters per
  * (partition, group) REGARDLESS of vocabulary size, where the exact
  * formulation shuffles the full per-term count relation.
  *
  * Guarantee (the reason the two-pass exact query works): every item
  * with true frequency > n/k is present in the summary, and that
  * property survives arbitrary summary merges (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). The summary may contain FALSE
  * candidates and its counters are lower bounds — so consumers that
  * need exactness re-count the ≤k candidates in a second, map-side
  * pass ([[graft.text.TextOps.docHeavyHitters]]).
  *
  * The candidate SET can depend on merge order (only the superset
  * guarantee is order-free), so `eval` output is NOT oracle-comparable
  * by itself — by design the exact pass downstream is what the oracle
  * gates.
  *
  * Update is O(1) amortized via the classic base-offset trick: a miss
  * on a full table logically decrements every counter, implemented as
  * `base += 1` with lazy eviction of entries whose stored count falls
  * to the base; compaction runs only when the base catches up with the
  * smallest stored count, so it always evicts at least one entry.
  */
case class MgSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSketchAgg.Buffer]
  with UnaryLike[Expression] {

  import MgSketchAgg._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_sketch needs a string input, got ${child.dataType}")
    else if (k < 1 || k > 100000)
      TypeCheckResult.TypeCheckFailure(s"mg_sketch k out of range: $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("terms", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): Buffer = new Buffer()

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val key = v.asInstanceOf[UTF8String].toString
      val stored = buf.counts.getOrElse(key, Long.MinValue)
      if (stored != Long.MinValue) {
        buf.counts(key) = stored + 1
        buf.levelDec(stored)
        buf.levelInc(stored + 1)
      } else if (buf.counts.size < k) {
        buf.counts(key) = buf.base + 1
        buf.levelInc(buf.base + 1)
      } else {
        // miss on a full table: logical decrement-all (new item's
        // logical count would be 0 → dropped, classic Misra-Gries)
        buf.base += 1
        if (buf.base >= buf.minStored) buf.compact()
      }
    }
    buf
  }

  override def merge(a: Buffer, b: Buffer): Buffer = {
    a.n += b.n
    b.counts.foreach { case (key, storedB) =>
      val logicalB = storedB - b.base
      if (logicalB > 0) {
        val storedA = a.counts.getOrElse(key, Long.MinValue)
        if (storedA != Long.MinValue) a.counts(key) = storedA + logicalB
        else a.counts(key) = a.base + logicalB
      }
    }
    // over-capacity after the union: subtract the (k+1)-th largest
    // logical count from everything (the mergeable-summaries reduction)
    a.rebuildLevels()
    if (a.counts.size > k) {
      val logicals = a.counts.values.map(_ - a.base).toArray
      java.util.Arrays.sort(logicals)
      val cut = logicals(logicals.length - k - 1) // (k+1)-th largest
      a.base += cut
      a.compact()
    }
    a
  }

  override def eval(buf: Buffer): Any = {
    // deterministic ORDER (desc lower-bound count, then term) — the
    // set itself is merge-order-dependent, see scaladoc
    val terms = buf.counts.toSeq
      .map { case (t, s) => (t, s - buf.base) }
      .filter(_._2 > 0)
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, _) => UTF8String.fromString(t) }
    InternalRow(buf.n, new GenericArrayData(terms.toArray[Any]))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    val live = buf.counts.toSeq.map { case (t, s) => (t, s - buf.base) }
      .filter(_._2 > 0)
    out.writeInt(live.size)
    live.foreach { case (t, c) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buffer()
    buf.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val c = in.readLong()
      buf.counts(new String(arr, java.nio.charset.StandardCharsets.UTF_8)) = c
      i += 1
    }
    buf.rebuildLevels()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MgSketchAgg =
    copy(child = newChild)
}

object MgSketchAgg {

  /** n processed, stored counts (logical = stored - base), and an
    * EXACT stored-count histogram (`levels`: stored → #entries). The
    * histogram makes the eviction watermark exact under increments —
    * a plain min-tracker goes stale-low when the unique minimum entry
    * is incremented, and an adversarial hit-min/miss interleaving then
    * triggers an O(k) compaction every two updates that evicts
    * nothing; with exact levels, compaction fires ONLY when ≥1 entry
    * is truly evictable, restoring the amortized-O(1) contract (each
    * compaction's scan is charged to the entries it evicts). */
  final class Buffer {
    var n: Long = 0L
    var base: Long = 0L
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    val levels: java.util.TreeMap[java.lang.Long, Integer] =
      new java.util.TreeMap()
    /** Compactions run — the amortization contract's test hook. */
    private[graft] var compactions: Long = 0L

    def minStored: Long =
      if (levels.isEmpty) Long.MaxValue else levels.firstKey

    def levelInc(s: Long): Unit = {
      val c = levels.get(s)
      levels.put(s, if (c == null) 1 else c + 1)
      ()
    }

    def levelDec(s: Long): Unit = {
      val c = levels.get(s)
      if (c == 1) levels.remove(s) else levels.put(s, c - 1)
      ()
    }

    def rebuildLevels(): Unit = {
      levels.clear()
      counts.valuesIterator.foreach(levelInc)
    }

    /** Evict entries whose logical count fell to ≤0. Runs only when
      * `base` has reached the exact watermark, so it evicts at least
      * one entry. */
    def compact(): Unit = {
      compactions += 1
      counts.filterInPlace { case (_, stored) => stored > base }
      while (!levels.isEmpty && levels.firstKey <= base)
        levels.remove(levels.firstKey)
    }
  }

  /** `mg_sketch(term, k)` expression builder (k a foldable int
    * literal) — shared by [[register]] and the
    * [[graft.plans.GraftExtensions]] SQL-only injection. */
  def build(exprs: Seq[Expression]): MgSketchAgg = {
    require(exprs.length == 2 && exprs(1).foldable,
      "mg_sketch(term, k): k must be a literal")
    MgSketchAgg(exprs.head,
      exprs(1).eval(null).asInstanceOf[Number].intValue())
  }

  /** Register `mg_sketch` in the session registry — same pattern as
    * [[HllSketchAgg.register]]. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("mg_sketch")
    if (!registry.functionExists(id))
      registry.createOrReplaceTempFunction("mg_sketch", build, "internal")
  }
}
