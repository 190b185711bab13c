package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_bounds(text)` — content-defined chunk boundary positions: every
  * 1-based position `p` in [8, length] where the polynomial hash of the
  * 8-char window ending at `p` (base/modulus from
  * [[graft.operators.TextAnalysis]], d8's rolling-hash constants) is
  * ≡ 0 mod 64.
  *
  * Replaces d39's composable form — `filter(sequence(8, n), p ->
  * aggregate(slice(codes, p-7, 8), ...))` — which re-slices and re-folds
  * 8 elements through the INTERPRETED higher-order-function machinery at
  * every position (NOTES hard-won facts #2/#3: per-element lambdas that
  * allocate, and HOFs are CodegenFallback). This expression computes the
  * same positions in ONE compiled rolling-hash pass: the modulus is 2⁵⁵
  * (a power of two), so `& MASK` is the exact mod — including over Java's
  * two's-complement intermediates — and the window roll is
  * `h' = ((h − c_out·31⁷)·31 + c_in) & MASK`.
  *
  * Character domain: code-unit values, matching `ascii(split(text, ''))`
  * for all BMP text (the corpus is ASCII; astral chars would diverge
  * from the oracle's codepoint split — same caveat the composable form
  * had). */
case class CdcBounds(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(CdcBounds.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CdcBounds.compute($s.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)

  override def prettyName: String = "cdc_bounds"
}

object CdcBounds {
  private val Base = graft.operators.TextAnalysis.RollBase // 31
  private val Mask = graft.operators.TextAnalysis.RollMod - 1L // 2^55 − 1
  /** 31⁷ mod 2⁵⁵ — the leaving character's weight in the 8-char window. */
  private val Pow7: Long = {
    var p = 1L
    (0 until 7).foreach(_ => p = (p * Base) & Mask)
    p
  }

  /** One O(n) rolling pass; called from both eval and generated code. */
  def compute(s: String): Array[Long] = {
    val n = s.length
    if (n < 8) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var h = 0L
    var i = 0
    while (i < 8) { h = (h * Base + s.charAt(i)) & Mask; i += 1 }
    if ((h & 63L) == 0L) out += 8L
    var p = 9
    while (p <= n) {
      h = (((h - s.charAt(p - 9) * Pow7) & Mask) * Base + s.charAt(p - 1)) & Mask
      if ((h & 63L) == 0L) out += p.toLong
      p += 1
    }
    out.result()
  }
}
