package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmsCounts, SketchFunctions}
import graft.operators.PortableHash

/** The [[graft.functions.CmsCounts]] Count-Min Sketch aggregate: grid
  * contents vs a reference single-threaded build, partial-merge
  * correctness under forced repartitioning, the weighted/per-occurrence
  * equivalence m6 relies on, the est-never-undercounts guarantee, null
  * handling, and the literal-argument contract. */
class CmsCountsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val D = 4
  private val W = 64

  /** Reference grid built on the driver with the shared bucket twin. */
  private def refGrid(hashes: Seq[(Long, Long)]): Seq[Long] = {
    val cells = new Array[Long](D * W)
    hashes.foreach { case (h, c) =>
      (0 until D).foreach(r => cells(r * W + CmsCounts.bucket(r, h, W)) += c)
    }
    cells.toSeq
  }

  private def estOf(grid: Seq[Long], h: Long): Long =
    (0 until D).map(r => grid(r * W + CmsCounts.bucket(r, h, W))).min

  test("grid equals the reference build under any partitioning") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val raw = (0 until 3000).map(i => s"tok_${i % 700}")
    val expected = refGrid(raw.map(t => PortableHash.hex60(t) -> 1L))
    for (parts <- Seq(1, 7)) {
      val got = raw.toDF("t").repartition(parts)
        .select(PortableHash.hex60(col("t")).as("gh"))
        .agg(SketchFunctions.cmsCounts(col("gh"), lit(1L), D, W).as("cms"))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("weighted pre-aggregated input equals per-occurrence weight-1 input") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val raw = (0 until 2000).map(i => s"w_${i % 311}")
    val perOcc = raw.toDF("t")
      .select(PortableHash.hex60(col("t")).as("gh"))
      .agg(SketchFunctions.cmsCounts(col("gh"), lit(1L), D, W))
      .head().getSeq[Long](0)
    val weighted = raw.toDF("t").groupBy("t").agg(count(lit(1)).as("c"))
      .select(PortableHash.hex60(col("t")).as("gh"), col("c"))
      .agg(SketchFunctions.cmsCounts(col("gh"), col("c"), D, W))
      .head().getSeq[Long](0)
    assert(perOcc == weighted)
  }

  test("point estimate never undercounts and stays within eps*N of truth") {
    import spark.implicits._
    SketchFunctions.register(spark)
    // zipfish frequencies: term i appears (1000 / (i+1)) times
    val raw = (0 until 400).flatMap(i => Seq.fill(1000 / (i + 1))(s"z_$i"))
    val n = raw.size
    val grid = raw.toDF("t")
      .select(PortableHash.hex60(col("t")).as("gh"))
      .agg(SketchFunctions.cmsCounts(col("gh"), lit(1L), D, W))
      .head().getSeq[Long](0)
    val exact = raw.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (t, c) =>
      val e = estOf(grid, PortableHash.hex60(t))
      assert(e >= c, s"$t: est $e < exact $c")
      // ~8x the e/W expected bound: a slack factor for the small grid
      assert(e - c <= (8.0 * math.E / W * n).toLong, s"$t: est $e vs $c (n=$n)")
    }
  }

  test("nulls are ignored; empty group yields the zero grid") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val got = Seq[(String, java.lang.Long)](("a", 7L), ("a", null), ("b", null))
      .toDF("g", "gh")
      .groupBy("g")
      .agg(SketchFunctions.cmsCounts(col("gh"), lit(1L), D, W).as("cms"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a").sum == D) // one token -> one increment per row
    assert(got("a") == refGrid(Seq(7L -> 1L)))
    assert(got("b").forall(_ == 0L))
  }

  test("d and w must be foldable literals within bounds") {
    import spark.implicits._
    SketchFunctions.register(spark)
    val df = Seq(1L).toDF("gh")
    intercept[Exception] {
      df.agg(call_function("cms_counts", col("gh"), lit(1L), col("gh"), lit(8)))
        .collect()
    }
    intercept[Exception] {
      df.agg(SketchFunctions.cmsCounts(col("gh"), lit(1L), 0, 8)).collect()
    }
    intercept[Exception] {
      df.agg(SketchFunctions.cmsCounts(col("gh"), lit(1L), 4, 1)).collect()
    }
  }
}
