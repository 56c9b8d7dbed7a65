package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_srp_codes(v)` — ALL `tables` sign-random-projection codes of a
  * vector in one fused pass: code `t` has bit `p` set iff
  * `Σ_j signs(t)(p)(j) · v(j) > 0`, with the ±1 sign planes drawn from the
  * same seeded RNG as [[graft.pipeline.Similarity.planeSigns]] (table `t`
  * seeds at `baseSeed + t·1000`, matching the SQL oracle mirrors).
  *
  * Exists because the composed form — `array(srpCode × L)` where each
  * srpCode is `b` DotProduct expressions against 64-literal CreateArrays —
  * generates L·b·dim element-write statements; at the solved (L=13, b=9)
  * working point the whole-stage-codegen method blows past the JIT's
  * method-size limits and the stage runs in the bytecode interpreter:
  * profiled 30-60 s of CPU per pass over FOUR THOUSAND rows in
  * `cosinePairs`. Here the sign matrix is one flat `double[]` reference
  * object and the generated code is a constant-size triple loop —
  * identical arithmetic (±1.0 multiply, left-to-right sum, strict `> 0`),
  * so codes are bit-for-bit the composed form's.
  */
case class SrpCodesExpr(
    child: Expression, tables: Int, planes: Int, dim: Int, baseSeed: Long)
  extends UnaryExpression {

  require(tables >= 1 && planes >= 1 && planes <= 63 && dim >= 1,
    s"bad SRP geometry: tables=$tables planes=$planes dim=$dim")

  override def prettyName: String = "graft_srp_codes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${dt.catalogString}")
  }

  /** Flat sign matrix: table-major, then plane, then component —
    * `signs(((t·planes)+p)·dim+j)`. Rebuilt on each executor (transient);
    * the RNG stream per table matches [[graft.pipeline.Similarity
    * .planeSigns]](planes, dim, baseSeed + t·1000) exactly. */
  @transient private lazy val signs: Array[Double] = {
    val out = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(baseSeed + t * 1000L)
      var i = 0
      while (i < planes * dim) {
        out(t * planes * dim + i) = if (rnd.nextBoolean()) 1.0 else -1.0
        i += 1
      }
      t += 1
    }
    out
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = math.min(dim, v.numElements())
    val codes = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var p = 0
      while (p < planes) {
        val base = (t * planes + p) * dim
        var s = 0.0
        var j = 0
        while (j < n) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          s += signs(base + j) * x
          j += 1
        }
        if (s > 0) code |= (1L << p)
        p += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val signsRef = ctx.addReferenceObj("srpSigns", signs, "double[]")
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val code = ctx.freshName("code")
      val base = ctx.freshName("base")
      val elemType = child.dataType.asInstanceOf[ArrayType].elementType
      val xv = CodeGenerator.getValue(v, elemType, j)
      s"""
         |int $n = Math.min($dim, $v.numElements());
         |long[] $codes = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $code = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int $base = ($t * $planes + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += $signsRef[$base + $j] * (double)($xv);
         |    }
         |    if ($s > 0) $code |= (1L << $p);
         |  }
         |  $codes[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpCodesExpr =
    copy(child = newChild)
}
