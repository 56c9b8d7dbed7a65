package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_pq_encode(v)` — product-quantization encoding against a FIXED
  * codebook, fused into one compiled pass: per subspace `mi`, the index
  * of the nearest (squared-L2) centroid; ties → lowest index (strict-<
  * scan). Result: `array<int>` of `m` codes.
  *
  * Same rationale as [[CentroidSimsExpr]]: the literal formulation
  * (m·kCent·dSub unrolled squared-difference terms, ~3k expression
  * nodes) compiles past the JIT method limit and the stage silently
  * drops to the bytecode interpreter — profiled ~1 ms/row on the
  * 2000-vector fixture (≈ 2 s per encode) where this fused loop runs
  * the same arithmetic in microseconds. The codebook rides along as a
  * flat constructor array; the generated code calls one compiled
  * method per row.
  *
  * Float contract (mirrored by the DuckDB oracle): each distance sums
  * `dSub` squared differences left-to-right; the argmin scan keeps the
  * FIRST minimum. */
case class PqEncodeExpr(child: Expression,
    cbFlat: Array[Double], m: Int, kCent: Int, dSub: Int)
  extends UnaryExpression {

  require(m > 0 && kCent > 0 && dSub > 0 && cbFlat.length == m * kCent * dSub,
    s"bad codebook geometry: ${cbFlat.length} cells for $m x $kCent x $dSub")

  override def prettyName: String = "graft_pq_encode"

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.catalogString}")
  }

  @transient private lazy val vIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** One fused pass; invoked from both interpreted and generated code. */
  def compute(vRaw: ArrayData): ArrayData = {
    val n = math.min(m * dSub, vRaw.numElements())
    val v = new Array[Double](m * dSub)
    var j = 0
    while (j < n) {
      v(j) = if (vIsFloat) vRaw.getFloat(j).toDouble else vRaw.getDouble(j)
      j += 1
    }
    val codes = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val vOff = mi * dSub
      var best = Double.MaxValue
      var bi = 0
      var ki = 0
      while (ki < kCent) {
        val cOff = (mi * kCent + ki) * dSub
        var s = 0.0
        var d = 0
        while (d < dSub) {
          val diff = v(vOff + d) - cbFlat(cOff + d)
          s += diff * diff
          d += 1
        }
        if (s < best) { best = s; bi = ki }
        ki += 1
      }
      codes(mi) = bi
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}
