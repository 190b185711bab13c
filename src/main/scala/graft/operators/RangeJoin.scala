package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bin decomposition — the generic
  * scale-out form of "join rows to the ranges that contain them"
  * (IP→location tables, time-interval attribution, concurrency analysis).
  *
  * Spark has no range-join strategy: a join whose only condition is
  * `p.v BETWEEN i.lo AND i.hi` has no equality key, so Catalyst plans a
  * BroadcastNestedLoopJoin (or a cartesian product), which is O(|points| ×
  * |intervals|) — a scale killer when both sides are large. The classic
  * fix (used by the Databricks range-join hint and by spatial engines as
  * 1-D grid hashing) is to manufacture the equality key: pick a bin width
  * W, explode each interval onto every bin it overlaps, tag each point
  * with the single bin it falls in, hash-join on the bin id, and re-check
  * the exact bounds as a post-join residual filter.
  *
  * Each qualifying (point, interval) pair is emitted exactly once — the
  * pair can only meet in the point's own bin — so no dedup pass is
  * needed. Cost is Σ(interval bin spans) + |points| shuffle rows and
  * |collisions| residual checks, all embarrassingly parallel; a hot bin
  * (many intervals overlapping one window) is an AQE skew-join split, not
  * a plan change. Pick W near the typical interval length: W too small
  * replicates long intervals across many bins, W too large turns the
  * residual filter into the real join.
  *
  * Intervals are closed ([lo, hi], both inclusive); columns are LONG
  * (callers bin timestamps via `unix_micros`). Bin ids use exact integer
  * floor-division (`div` on the pmod-aligned value), so the binning is
  * correct over the full long range, including negatives.
  *
  * `maxBinsPerInterval` is the runaway guard: one open-ended interval
  * (e.g. a never-closed session with hi = +inf) would otherwise explode
  * into millions of rows; exceeding the cap fails the job with a clear
  * message instead of silently melting an executor.
  */
object RangeJoin {

  /** Exact floor(x / w) in pure long arithmetic (codegen-friendly,
    * no double rounding): align x down to a multiple of w with pmod,
    * then integral-divide. */
  private def floorDiv(colName: String, w: Long): Column =
    expr(s"(`$colName` - pmod(`$colName`, ${w}L)) div ${w}L")

  /** Join `points` to every interval containing them.
    *
    * @param points    left side; `pointCol` LONG plus any payload columns
    * @param intervals right side; `loCol`/`hiCol` LONG plus payload
    *                  columns (names must not collide with `points`)
    * @param binWidth  bin width in the column's units (e.g. microseconds)
    * @param joinType  "inner" or "left" (points with no containing
    *                  interval survive with NULL interval columns)
    * @param maxBinsPerInterval fail-fast cap on interval bin spans
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long, joinType: String = "inner",
                      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(Set("inner", "left").contains(joinType),
      s"joinType must be inner or left, got $joinType")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals must not share column names: $overlap")

    val binLo = floorDiv(loCol, binWidth)
    val binHi = floorDiv(hiCol, binWidth)
    // The guard lives INSIDE the sequence bound (not a dropped side
    // column, which column pruning would silently eliminate): an
    // oversized interval raises before it can explode.
    val safeHi = when(binHi - binLo < lit(maxBinsPerInterval.toLong), binHi)
      .otherwise(raise_error(concat(
        lit(s"interval spans >= $maxBinsPerInterval bins of $binWidth; " +
          "widen binWidth or cap interval length ("), col(loCol),
        lit(".."), col(hiCol), lit(")"))))
    // An INVERTED interval (lo > hi) is the empty closed set [lo, hi] = ∅:
    // it must match nothing — and it must not reach `sequence`, whose
    // default step for start > stop is -1, generating |span| DESCENDING
    // bins (the exact explosion the cap exists to prevent, and one the
    // span guard above cannot see because its difference goes negative).
    // A NULL bin array makes `explode` drop the interval row, which is
    // the correct join result for an empty interval on both join types.
    val bins = when(binHi < binLo, lit(null).cast("array<long>"))
      .otherwise(sequence(binLo, safeHi))
    val guarded = intervals.withColumn("_ibin", explode(bins))
    val binned = points.withColumn("_pbin", floorDiv(pointCol, binWidth))

    val cond = col("_pbin") === col("_ibin") &&
      col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
    binned.join(guarded, cond, joinType).drop("_pbin", "_ibin")
  }
}
