package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.roaringbitmap.longlong.Roaring64Bitmap

/** `graft_bitmap_neighbors(id)` — deduplicated neighbor set aggregated as
  * a compressed Roaring bitmap, evaluated to a SORTED `array<bigint>`.
  *
  * The direct Spark analogue of the reference's `groupBitmap` adjacency
  * state (brahmand ddl_query.rs:290-311 builds AggregatingMergeTree index
  * tables over `groupBitmapState(to_id)`): the aggregation BUFFER is the
  * bitmap — O(1) amortized insert, run-compressed storage, and map-side
  * combine merges are bitwise ORs over containers instead of hash-set
  * unions of boxed longs. On a power-law fan-out graph the hot groups are
  * exactly the huge ones, where `collect_set`'s `mutable.HashSet[Any]`
  * buffer costs boxing + rehashing per insert and serializes as an array
  * of objects; the bitmap buffer stays compact (runs of adjacent ids
  * compress to 4 bytes) and its shuffle bytes are the compressed size.
  *
  * The OUTPUT shape is kept as `array<bigint>` — identical to the
  * `collect_set` it replaces in [[graft.GraftSession.adjIndex]] (modulo
  * order: bitmap output is ascending, which also makes the persisted
  * index deterministic) — so the explode-read path and bucketed persisted
  * tables are unchanged.
  */
case class BitmapNeighborsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def prettyName: String = "graft_bitmap_neighbors"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (node id), got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: Roaring64Bitmap, b2: Roaring64Bitmap): Roaring64Bitmap = {
    b1.or(b2)
    b1
  }

  /** Ascending neighbor ids (Roaring iteration order). */
  override def eval(buffer: Roaring64Bitmap): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: Roaring64Bitmap): Array[Byte] = {
    buffer.runOptimize()
    val bos = new ByteArrayOutputStream(
      math.min(buffer.serializedSizeInBytes(), Int.MaxValue.toLong).toInt)
    buffer.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapNeighborsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapNeighborsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapNeighborsAgg =
    copy(child = newChildren.head)
}
