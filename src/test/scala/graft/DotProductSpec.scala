package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DotProduct

class DotProductSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dot_product equals the aggregate/zip_with fold bit-for-bit") {
    import spark.implicits._
    DotProduct.register(spark)
    val arrays = Gen.choose(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1e3, 1e3)).flatMap(a =>
        Gen.listOfN(n, Gen.choose(-1e3, 1e3)).map(b => (a, b))))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20),
      Prop.forAllNoShrink(Gen.listOfN(10, arrays)) { pairs =>
        val df = pairs.toDF("a", "b")
        val rows = df.select(
          DotProduct.dotProduct(col("a"), col("b")).as("fast"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0.0), (acc, v) => acc + v).as("ref")).collect()
        rows.forall(r => r.getDouble(0) == r.getDouble(1))
      })
    assert(res.passed, res.status.toString)
  }

  test("dot_product from SQL; unequal lengths and null inputs yield null") {
    DotProduct.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       dot_product(array(1.0d), array(1.0d, 2.0d)) AS bad,
        |       dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nl""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
  }

  test("dot_product stays inside whole-stage codegen (no fallback)") {
    DotProduct.register(spark)
    // non-foldable input (literals would constant-fold to LocalTableScan)
    val df = spark.range(4).select(
      DotProduct.dotProduct(
        array(col("id").cast("double"), lit(2.0)),
        array(lit(3.0), col("id").cast("double"))).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 5.0, 10.0, 15.0))
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("*("), s"expected codegen stage marker in:\n$s")
  }
}
