package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_kmv(h, k)` — the k-minimum-values distinct-count sketch
  * (Bar-Yossef et al. 2002): keep the k smallest DISTINCT hash values in
  * UNSIGNED order; the estimator `(k-1) · 2^64 / u_k` (u_k = the k-th
  * minimum as an unsigned real) follows from the k-th order statistic of
  * uniform hashes. This is the deterministic, engine-mirrorable form of
  * approximate COUNT(DISTINCT): the same XXH64 values sort the same way
  * in DuckDB, so the sketch has an EXACT SQL oracle — unlike HLL, whose
  * register layout no two engines share.
  *
  * Map-side combinable (merge = union + re-trim), so a corpus-scale
  * distinct estimate shuffles k longs per group instead of the full
  * distinct value set — the entire point at 100 TB, where exact
  * COUNT(DISTINCT token) is a vocabulary-sized shuffle.
  *
  * Returns the ≤k minima ascending-unsigned as `array<bigint>` (signed
  * Java longs, UNSIGNED order). Fewer than k distinct inputs ⇒ all of
  * them — the estimator then degrades to the exact count by definition.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"kmv needs k > 1 (estimator divides by k-1), got $k")

  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (a hash value), got ${dt.catalogString}")
  }

  private def newBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](
      (a: java.lang.Long, b: java.lang.Long) =>
        java.lang.Long.compareUnsigned(a, b))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    newBuffer()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert when it would make the cut — keeps the hot path a
      // single unsigned compare against the current k-th minimum
      if (buf.size < k || java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}
