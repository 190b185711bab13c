package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

import graft.nlp.Similarity

/** `ratcliff_sim(a, b)` — Ratcliff/Obershelp similarity as a native
  * Catalyst expression (SURVEY §7.4: the one fuzzy metric Spark lacks;
  * `levenshtein` approximates difflib behavior but not its values, so
  * exact difflib parity needs this).
  *
  * BinaryExpression with null-propagation; CodegenFallback is deliberate:
  * the recursive longest-match scan doesn't flatten into branch-free
  * generated Java, and entity resolution calls this on dimension-sized
  * inputs (thousands of rows), never in a 100 TB hot path — q19-style
  * similarity joins stay on codegen'd `levenshtein` where throughput
  * matters.
  */
case class RatcliffSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    Similarity.ratio(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RatcliffSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ratcliff_sim"
}

object RatcliffSimilarity {

  val info: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("ratcliff_sim"),
    new ExpressionInfo(classOf[RatcliffSimilarity].getName, "ratcliff_sim"),
    (children: Seq[Expression]) => RatcliffSimilarity(children(0), children(1)))

  /** Idempotent session registration (for sessions built without the
    * extension). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)

  /** Column-API surface once registered. */
  def ratcliffSim(a: Column, b: Column): Column = call_function("ratcliff_sim", a, b)
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(RatcliffSimilarity.info)
    ext.injectFunction(DotProduct.info)
    ext.injectFunction(SketchFunctions.simhashInfo)
    ext.injectFunction(SketchFunctions.minhashInfo)
    ext.injectFunction(SketchFunctions.hex60Info)
    ext.injectFunction(SketchFunctions.kminInfo)
    ext.injectFunction(SketchFunctions.topkInfo)
    ext.injectFunction(SketchFunctions.cmsInfo)
    ext.injectFunction(UnicodeNorm.info)
    ext.injectFunction(NearestEntry.info)
    ext.injectFunction(BloomFunctions.info)
    // optimizer depth: naive band joins (abs(a-b) <= k, no equi key)
    // rewrite to the bucketed equi-join RangeJoin builds by hand
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
