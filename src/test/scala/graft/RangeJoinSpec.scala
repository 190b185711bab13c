package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bin-decomposed range join: agreement with the naive BETWEEN join on
  * seeded random data (including negative values and bin-boundary hits),
  * exactly-once pair emission across multi-bin intervals, left-outer
  * survival of uncontained points, the oversized-interval guard, and the
  * no-BNLJ plan property that is the operator's reason to exist. */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def mkData(seed: Long, nPoints: Int, nIntervals: Int, span: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // points straddle zero and land on bin boundaries with prob ~1/10
    val pts = (0 until nPoints).map { i =>
      val v = rnd.nextLong() % span
      (i.toLong, if (rnd.nextInt(10) == 0) v - v % 100L else v)
    }.toDF("pid", "v")
    val ivs = (0 until nIntervals).map { j =>
      val lo = rnd.nextLong() % span
      val len = rnd.nextInt(500).toLong
      (j.toLong + 10000L, lo, lo + len)
    }.toDF("iid", "lo", "hi")
    (pts, ivs)
  }

  test("agrees with the naive BETWEEN join (seeded random, negatives, boundaries)") {
    val (pts, ivs) = mkData(seed = 42L, nPoints = 400, nIntervals = 300, span = 5000L)
    val got = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", binWidth = 100L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pts.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "pairs must be emitted exactly once")
    assert(got.toSet == want.toSet,
      s"missing=${(want.toSet -- got.toSet).take(5)} extra=${(got.toSet -- want.toSet).take(5)}")
    assert(want.nonEmpty, "degenerate fixture: no overlapping pairs to check")
  }

  test("interval spanning many bins still emits each containing pair once") {
    import spark.implicits._
    val pts = Seq((1L, 250L), (2L, 999L), (3L, -50L)).toDF("pid", "v")
    val ivs = Seq((7L, 0L, 1000L)).toDF("iid", "lo", "hi") // 11 bins at width 100
    val got = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 100L)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L), s"got ${got.toSeq}")
  }

  test("left join keeps uncontained points with NULL interval columns") {
    import spark.implicits._
    val pts = Seq((1L, 50L), (2L, 5000L)).toDF("pid", "v")
    val ivs = Seq((7L, 0L, 100L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 100L, joinType = "left")
      .select("pid", "iid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(7L), 2L -> None))
  }

  test("oversized interval fails fast instead of exploding") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("pid", "v")
    val ivs = Seq((7L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 10L,
        maxBinsPerInterval = 1000).count()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).map(c => Option(c.getMessage).getOrElse("")).mkString
        .contains("spans >= 1000 bins"), s"unexpected error: $ex")
  }

  test("inverted interval (lo > hi) matches nothing — and never explodes") {
    import spark.implicits._
    val pts = Seq((1L, 50L), (2L, 500L)).toDF("pid", "v")
    // iid=8 is inverted with a HUGE |span| (would be ~10^6 descending bins
    // if it reached sequence(), and its negative span slips past the
    // max-bins difference check); iid=7 is a normal control interval
    val ivs = Seq((7L, 0L, 100L), (8L, 100000000L, 0L)).toDF("iid", "lo", "hi")
    val inner = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 100L,
        maxBinsPerInterval = 1000)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(inner.toSet == Set((1L, 7L)), s"got ${inner.toSeq}")
    // left join: the point uncovered once the inverted interval is empty
    // survives with NULLs, same as any uncontained point
    val left = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 100L,
        joinType = "left", maxBinsPerInterval = 1000)
      .select("pid", "iid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(left == Map(1L -> Some(7L), 2L -> None))
  }

  test("colliding column names are rejected up front") {
    import spark.implicits._
    val pts = Seq((1L, 5L)).toDF("id", "v")
    val ivs = Seq((7L, 0L, 10L)).toDF("id", "lo", "hi")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 10L)
    }
    assert(ex.getMessage.contains("share column names"))
  }

  test("plans as an equi-join on bin id — no BNLJ, no cartesian product") {
    val (pts, ivs) = mkData(seed = 7L, nPoints = 200, nIntervals = 200, span = 4000L)
    val df = RangeJoin.pointInInterval(pts, ivs, "v", "lo", "hi", 100L)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bin decomposition must eliminate the nested-loop join")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bin id:\n$plan")
  }
}
