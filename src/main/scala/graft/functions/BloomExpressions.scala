package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key, bloom_bytes)` — membership probe of a long key
  * against a serialized `org.apache.spark.util.sketch.BloomFilter`, as a
  * codegen'd Catalyst predicate (the same mechanism Spark's own runtime
  * row-level filtering injects for shuffle joins, exposed as a reusable
  * building block for planned-ahead semi-join pruning — see
  * `graft.operators.BloomPrune`).
  *
  * The second argument must be FOLDABLE (a literal produced by
  * [[BloomFunctions.serialize]]): the filter deserializes once per
  * executor/codegen reference, never per row, and the probe compiles to a
  * single virtual call inside whole-stage codegen. False positives pass
  * (by bloom contract — callers re-check exactly), false negatives cannot
  * occur, NULL keys yield NULL (a filter drops them, matching inner/semi
  * join null semantics).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, BinaryType)

  require(right.foldable,
    "bloom_might_contain needs a literal serialized bloom filter as its " +
      "second argument (build one with BloomFunctions.serialize)")

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval(null).asInstanceOf[Array[Byte]]))

  override def nullSafeEval(key: Any, bytes: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $f.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "bloom_might_contain"
}

object BloomFunctions {

  val info: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
    (children: Seq[Expression]) => BloomMightContain(children(0), children(1)))

  /** Idempotent session registration. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(info._1, info._2, info._3)

  /** Wire form of a filter, for embedding as a literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Column surface; callers must have registered on the session. */
  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    call_function("bloom_might_contain", key, lit(bloomBytes))
}
