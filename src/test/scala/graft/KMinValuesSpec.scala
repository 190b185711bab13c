package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchFunctions
import graft.operators.PortableHash

/** The [[graft.functions.KMinValues]] bounded-state KMV aggregate:
  * sketch contents vs a reference k-smallest-distinct computation, state
  * bound, dedup, null handling, partial-merge correctness under forced
  * repartitioning, and the estimator's accuracy envelope. */
class KMinValuesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def kminOf(values: Seq[Long], k: Int): Seq[Long] =
    values.distinct.sorted.take(k)

  test("sketch equals the k smallest distinct hashes, any partitioning") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val raw = (0 until 5000).map(i => s"tok_${i % 1200}") // heavy duplicates
    val expected = kminOf(raw.map(PortableHash.hex60), 64)
    for (parts <- Seq(1, 7)) {
      val got = raw.toDF("t").repartition(parts)
        .select(PortableHash.hex60(col("t")).as("gh"))
        .agg(SketchFunctions.kminValues(col("gh"), 64).as("km"))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("group with fewer than k distinct values returns the exact ascending set") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val got = Seq(5L, 3L, 5L, 9L, 3L).toDF("gh")
      .agg(SketchFunctions.kminValues(col("gh"), 64).as("km"))
      .head().getSeq[Long](0)
    assert(got == Seq(3L, 5L, 9L))
  }

  test("nulls are ignored; all-null group yields an empty array") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val got = Seq[(String, java.lang.Long)](("a", 7L), ("a", null), ("b", null))
      .toDF("g", "gh")
      .groupBy("g")
      .agg(SketchFunctions.kminValues(col("gh"), 4).as("km"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(7L))
    assert(got("b") == Seq())
  }

  test("KMV estimate lands within 3/sqrt(k) of the true distinct count") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val k = 64
    val n = 20000 // distinct tokens; hashes ~ uniform on [0, 2^60)
    val row = spark.range(n).select(PortableHash.hex60(concat(lit("u"), col("id"))).as("gh"))
      .agg(SketchFunctions.kminValues(col("gh"), k).as("km"))
      .head()
    val kth = row.getSeq[Long](0).last
    val est = (k - 1).toDouble * math.pow(2, 60) / kth.toDouble
    val rel = math.abs(est - n) / n
    assert(rel <= 3.0 / math.sqrt(k), s"est $est vs $n (rel $rel)")
  }

  test("k must be a foldable literal and >= 1") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val df = Seq(1L).toDF("gh")
    intercept[Exception] {
      df.agg(call_function("kmin_values", col("gh"), col("gh"))).collect()
    }
    intercept[Exception] {
      df.agg(SketchFunctions.kminValues(col("gh"), 0)).collect()
    }
  }
}
