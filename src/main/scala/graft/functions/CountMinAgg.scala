package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_cms(buckets)` — a Count-Min sketch (Cormode & Muthukrishnan
  * 2005) folded as ONE aggregate: the input is the row's pre-computed
  * bucket index per sketch row (`array<int>` of length d, one pmod'd
  * hash per row — computed OUTSIDE so the hash family stays a visible,
  * oracle-mirrorable expression), and the buffer is the d×w counter
  * matrix flattened row-major. Point estimate for a key = min over its
  * d cells; always ≥ the true count, within εN with ε = e/w at
  * confidence 1−e^−d.
  *
  * Every update is `+weight` into d cells (weight defaults to 1 — the
  * per-occurrence form) — addition is order-free, so unlike
  * sum-of-floats the sketch is DETERMINISTIC under any partitioning and
  * merge order (merge = element-wise add), and the DuckDB oracle can
  * rebuild the exact same counters from group-bys. The weighted form
  * lets a PRE-GROUPED (key, count) frame feed the sketch — identical
  * counters to streaming every occurrence, because counter addition
  * commutes — so one tokenize+group pass can serve both the sketch and
  * an exact top-k without a second corpus scan. This is the
  * heavy-hitter / frequency-estimate primitive at 100 TB: the shuffle
  * carries d·w longs total instead of the vocabulary.
  */
case class CountMinAgg(
    child: Expression,
    d: Int,
    w: Int,
    weight: Expression = Literal(1L),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0 && w > 0 && d.toLong * w <= (1 << 22),
    s"sketch geometry out of range: $d x $w")

  override def prettyName: String = "graft_cms"
  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (ArrayType(IntegerType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, wt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> bucket indices, integral weight), " +
          s"got (${t.catalogString}, ${wt.catalogString})")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val wv = weight.eval(input)
      val inc = wv match {
        case null => 0L
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      val idx = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(idx.numElements() == d,
        s"expected $d bucket indices, got ${idx.numElements()}")
      var r = 0
      while (r < d) {
        val j = idx.getInt(r)
        require(j >= 0 && j < w, s"bucket $j out of [0, $w)")
        buf(r * w + j) += inc
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(d * w)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren(0), weight = newChildren(1))
}
