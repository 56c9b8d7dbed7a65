package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_minhash(hash)` — the full k-slot MinHash signature as ONE
  * aggregate with a single `Array[Long]` buffer (the reference's
  * groupBitmapState analogue re-imagined for sketches: a
  * TypedImperativeAggregate with a mutable buffer, exactly the extension
  * slot SURVEY.md §2.5 budgets).
  *
  * Versus k separate `min(xxhash64(h, k))` aggregate columns: one buffer
  * allocation per group instead of k SQL aggregate slots, one update-loop
  * call per input row, and a schema that stays a single `array<bigint>`
  * column. Map-side combinable (merge = element-wise min), so the shuffle
  * carries k longs per group.
  *
  * The per-slot hash family is XXH64 re-seeded by the slot index —
  * deterministic across executors, no wrapping arithmetic (ANSI-safe by
  * construction since it never goes through SQL arithmetic).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "graft_minhash"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (pre-hashed shingle), got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < numHashes) {
        val m = XXH64.hashLong(h, k)
        if (m < buffer(k)) buffer(k) = m
        k += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (b2(k) < b1(k)) b1(k) = b2(k)
      k += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}
