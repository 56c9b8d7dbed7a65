package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_hash_embed(toks, idf)` — the feature-hashed TF-IDF apply
  * ([[graft.pipeline.TextAnalysis.hashedTfidfApply]]) fused into one
  * compiled pass per row: xxhash64 each token (seed 42 — Spark's
  * `xxhash64`), bucket = floorMod(h, dim), ±1 sign from the next hash
  * bit, integer sign sums into a dim-long accumulator, idf multiply,
  * in-order norm fold, HALF_UP 6-dp components.
  *
  * Bit-identical to the HOF formulation it replaces (spec-pinned against
  * the batch operator and the shared DuckDB oracle). The HOF form
  * re-scanned the token array once PER BUCKET — dim·|tokens| lambda steps
  * through struct accessors — profiled 9 s at sf0.1 where this loop does
  * the same arithmetic in one |tokens| pass plus a dim pass.
  *
  * Float contract (mirrored by the oracle): w(b) = signSum(b)·idf(b)
  * with the products accumulated b = 0..dim−1 into the squared norm
  * (matches `graft_dot`'s in-order fold); components round HALF_UP to
  * 6 dp exactly like Spark's `round`. Returns null for a zero-norm
  * document (no token carries idf weight) — same contract as the
  * composed form. */
case class HashEmbedExpr(child: Expression, idf: Array[Double])
    extends UnaryExpression {

  private val dim = idf.length
  require(dim > 0 && (dim & (dim - 1)) == 0,
    s"idf model length must be a positive power of two, got $dim")

  override def prettyName: String = "graft_hash_embed"
  override def nullable: Boolean = true // zero-norm docs → null vec
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${dt.catalogString}")
  }

  @transient private lazy val logDim =
    java.lang.Integer.numberOfTrailingZeros(dim)

  /** One fused pass; called from interpreted and generated code. Null
    * token elements are skipped — the exploded batch path filters them. */
  def compute(toks: ArrayData): ArrayData = {
    val w0 = new Array[Long](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = SimHashUtil.hash(toks.getUTF8String(i))
        val b = java.lang.Math.floorMod(h, dim.toLong).toInt
        w0(b) += (((h >> logDim) & 1L) << 1) - 1L
      }
      i += 1
    }
    val w = new Array[Double](dim)
    var s = 0.0
    var b = 0
    while (b < dim) {
      val x = w0(b).toDouble * idf(b)
      w(b) = x
      s += x * x
      b += 1
    }
    val nrm = math.sqrt(s)
    if (nrm == 0.0) return null
    val out = new Array[Any](dim)
    b = 0
    while (b < dim) {
      out(b) = java.math.BigDecimal.valueOf(w(b) / nrm)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      b += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("hashEmbed", this, classOf[HashEmbedExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $self.compute($v);
      |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}
