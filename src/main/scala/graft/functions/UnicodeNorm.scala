package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)` — Unicode NFC (canonical composition) as a
  * codegen'd Catalyst expression. Spark ships no normalization function,
  * yet a multilingual corpus build needs one before ANY hash-keyed
  * operator: "café" with a precomposed é and "café" with e + combining
  * acute are byte-DIFFERENT, so exact dedup (d1), MinHash shingles (m1),
  * vocabulary counts (d10), and fingerprints (d4) all silently treat
  * canonically-equal text as distinct until the corpus is normalized.
  *
  * Both this expression (`java.text.Normalizer`, ICU-conformant) and
  * DuckDB's `nfc_normalize` (utf8proc) implement the same Unicode
  * canonical-composition algorithm, so the d42 oracle checks real
  * cross-engine parity on synthesized decomposed text — the same
  * class of check as k3's regex parity. Fast path: `isNormalized` is a
  * cheap quick-check scan (ASCII and most already-composed text short-
  * circuits without allocating), so the common case costs one scan. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.UnicodeNorm.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object UnicodeNorm {

  /** Static helper shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val info: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)

  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)
}
