package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchFunctions

/** The [[graft.functions.TopKPairs]] bounded-heap top-k aggregate:
  * equality with the window row_number form under any partitioning,
  * score ties broken by id, under-k groups, and null handling. */
class TopKPairsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def reference(rows: Seq[(String, Double, Long)], k: Int)
      : Map[String, Seq[(Double, Long)]] =
    rows.groupBy(_._1).map { case (g, v) =>
      g -> v.map(r => (r._2, r._3)).sortBy { case (s, i) => (-s, i) }.take(k)
    }

  test("equals the sorted top-k per group under any partitioning") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val rows = (0 until 3000).map { i =>
      (s"g${i % 7}", (i * 37 % 100).toDouble, i.toLong)
    }
    val want = reference(rows, 5)
    for (parts <- Seq(1, 8)) {
      val got = rows.toDF("g", "s", "id").repartition(parts)
        .groupBy("g")
        .agg(SketchFunctions.topkPairs(col("s"), col("id"), 5).as("top"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))))
        .toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("score ties break on id ascending — deterministic emission order") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val got = Seq(("g", 1.0, 9L), ("g", 1.0, 2L), ("g", 1.0, 5L), ("g", 2.0, 7L))
      .toDF("g", "s", "id")
      .groupBy("g")
      .agg(SketchFunctions.topkPairs(col("s"), col("id"), 3).as("top"))
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(p => (p.getDouble(0), p.getLong(1)))
    assert(got == Seq((2.0, 7L), (1.0, 2L), (1.0, 5L)))
  }

  test("group smaller than k returns all rows, best first; null score/id skipped") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val got = Seq[(String, java.lang.Double, java.lang.Long)](
      ("a", 3.0, 1L), ("a", null, 2L), ("a", 4.0, null), ("b", 1.0, 4L))
      .toDF("g", "s", "id")
      .groupBy("g")
      .agg(SketchFunctions.topkPairs(col("s"), col("id"), 10).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))))
      .toMap
    assert(got("a") == Seq((3.0, 1L)))
    assert(got("b") == Seq((1.0, 4L)))
  }
}
