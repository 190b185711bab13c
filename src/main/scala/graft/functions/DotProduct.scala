package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(a, b)` — sequential-order dot product of two double
  * arrays as a codegen'd Catalyst expression.
  *
  * The composable form `aggregate(zip_with(a, b, *), 0.0, +)` evaluates
  * through interpreted lambda machinery (higher-order functions are
  * CodegenFallback) and allocates an intermediate product array; this
  * expression generates a tight primitive loop instead. Identical
  * accumulation order (index 0..n-1, `acc + a(i)*b(i)`), so results are
  * bit-for-bit the same and DuckDB's `list_dot_product` (also
  * sequential) stays a valid oracle.
  *
  * Arrays of unequal length yield null (the zip_with form yields null
  * too, via null-padding); null ELEMENTS are not supported (embedding
  * columns are dense by construction).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  // null on length mismatch even when both inputs are non-null — the
  // default (children-derived) nullability would let the engine assume
  // a value exists
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  val info: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => DotProduct(children(0), children(1)))

  /** Idempotent session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)

  /** Column surface; callers must have registered on the session. */
  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)

  /** Squared L2 distance via the codegen'd dot: |a−b|² = |a|² − 2a·b + |b|².
    * The LEFT-ASSOC expansion order is load-bearing: the DuckDB oracles
    * replay it as `ldp(a,a) - 2.0 * ldp(a,b) + ldp(b,b)` and bit-exact
    * parity (i1/i2) depends on both engines associating identically —
    * keep the ONE definition here (IvfSearch and PqSearch both use it). */
  def dist2(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.lit
    dotProduct(a, a) - lit(2.0) * dotProduct(a, b) + dotProduct(b, b)
  }
}
