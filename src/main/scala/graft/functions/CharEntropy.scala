package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_char_entropy(text)` — Shannon entropy (nats) of the string's
  * CODEPOINT distribution, the classic cheap gibberish / encoding-junk /
  * binary-spill detector (natural text sits in a narrow entropy band;
  * base64 blobs and repeated-char padding fall far outside it).
  *
  * One fused pass per row: count codepoints into an ordered map, then
  * fold `-Σ p·ln p` in ASCENDING codepoint order — the sorted-fold
  * determinism rule, so the DuckDB oracle (per-codepoint counts,
  * `list(... ORDER BY cp)`, left-fold) reproduces the sum term for term.
  * Codepoints (not UTF-16 units) match both engines' `length()`/
  * `unicode()` semantics. Empty string → 0.0; null → null.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_char_entropy"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got ${t.catalogString}")
  }

  /** One fused pass; invoked from both interpreted and generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    if (n == 0L) return 0.0
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * math.log(p)
    }
    -acc
  }

  override def nullSafeEval(s: Any): Any = compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charEntropy", this,
      classOf[CharEntropyExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}
