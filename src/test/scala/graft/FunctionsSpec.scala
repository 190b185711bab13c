package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, RatcliffSimilarity}
import graft.nlp.Similarity

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ratcliff_sim evaluates like the driver-side Similarity.ratio") {
    import spark.implicits._
    RatcliffSimilarity.register(spark)
    val pairs = Seq(("abcd", "bcde"), ("mumbay", "mumbai"), ("qabxcd", "abycdf"),
      ("", ""), ("abc", ""))
    val got = pairs.toDF("a", "b")
      .select(RatcliffSimilarity.ratcliffSim(col("a"), col("b"))).collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) => Similarity.ratio(a, b) }
    assert(got.toSeq == want)
  }

  test("ratcliff_sim is callable from SQL and null-propagates") {
    RatcliffSimilarity.register(spark)
    val r = spark.sql("SELECT ratcliff_sim('AMERIC', 'AMERICA') AS s, ratcliff_sim(NULL, 'x') AS n")
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 12.0 / 13) < 1e-12)
    assert(r.isNullAt(1))
  }

  test("GraftExtensions registers ratcliff_sim into a function registry") {
    // exercise the extension path directly (a session built with
    // spark.sql.extensions runs exactly this registration); a fresh
    // registry proves the injection carries everything lookup needs
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    org.apache.spark.sql.GraftTestKit.registerFunctions(ext, reg)
    val fn = org.apache.spark.sql.catalyst.FunctionIdentifier("ratcliff_sim")
    assert(reg.functionExists(fn))
    val built = reg.lookupFunction(fn,
      Seq(org.apache.spark.sql.catalyst.expressions.Literal("abcd"),
        org.apache.spark.sql.catalyst.expressions.Literal("bcde")))
    assert(built.eval(null) == 0.75)
  }
}
