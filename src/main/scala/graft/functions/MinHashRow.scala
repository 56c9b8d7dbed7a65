package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_minhash_row(hs)` — the full k-slot MinHash signature computed
  * PER ROW from a document's hashed-shingle array: slot k holds
  * `min over h in hs of XXH64.hashLong(h, k)`, bit-identical to
  * [[MinHashAgg]]'s grouped fold over the exploded shingles
  * (spec-pinned equality).
  *
  * Why a row expression when the aggregate exists: the grouped form
  * needs a hash exchange and blocking aggregation state, which (a) an
  * unbounded stream cannot pay — this expression is what lets the
  * ingestion-admission path sign micro-batches statelessly — and (b) the
  * batch signature build doesn't need either: signing is a pure function
  * of one row's shingle set, so explode → groupBy → join-back was three
  * operators where one projection suffices. Same total XXH64 work
  * either way (|hs|·k hashes); this form keeps it inside whole-stage
  * codegen with zero data movement.
  *
  * Empty input → all `Long.MaxValue` slots, matching the aggregate's
  * untouched buffer for an empty group.
  */
case class MinHashRowExpr(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def prettyName: String = "graft_minhash_row"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (pre-hashed shingles), got ${t.catalogString}")
  }

  /** One fused pass; invoked from both interpreted and generated code. */
  def compute(hs: ArrayData): ArrayData = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < numHashes) {
        val m = XXH64.hashLong(h, k)
        if (m < buf(k)) buf(k) = m
        k += 1
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  override def nullSafeEval(hs: Any): Any = compute(hs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashRow", this,
      classOf[MinHashRowExpr].getName)
    nullSafeCodeGen(ctx, ev, hs => s"${ev.value} = $self.compute($hs);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashRowExpr =
    copy(child = newChild)
}
