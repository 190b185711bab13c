package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact linear-interpolated percentiles computed sort-based — the 100 TB
  * replacement for `percentile()` (SURVEY §2.4 statistics surface).
  *
  * Spark's exact `percentile` aggregate buffers EVERY value of a group in
  * the aggregation state (ObjectHashAggregate), so a hot group at data
  * scale OOMs the reducer; `approx_percentile` fixes memory but loses
  * oracle exactness. This operator gets both: rank the values with a
  * window sort (a disk-spillable shuffle sort, never an in-memory buffer),
  * compute each percentile's bracketing ranks from the group counts, and
  * fetch exactly 2 rows per (group, percentile) with a broadcast of the
  * tiny target-rank table. The interpolation uses the WEIGHTED form
  * `(higherIndex - position) * lowerValue + (position - lowerIndex) *
  * higherValue` — the exact formula of Spark's `Percentile.getPercentile`
  * AND (verified empirically on 1-ulp-divergent doubles) of DuckDB's
  * `quantile_cont`; the algebraically-equal lerp form
  * `lo + (hi - lo) * frac` can differ from both by 1 ulp, which the
  * repr-exact oracle gate would flag. Groups whose values are all NULL
  * surface with NULL percentiles, matching `percentile()`/`quantile_cont`
  * row counts.
  */
object DistributedPercentile {

  /** One row per group with a column per requested percentile.
    *
    * @param ps (outputColumnName, fraction in [0,1]) pairs
    */
  def groupPercentiles(df: DataFrame, keyCol: String, valCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_v"))
    // percentile()/quantile_cont ignore NULLs; rank/count only real values
    // (an ascending sort would otherwise rank nulls first and skew both
    // the count and the bracketing ranks)
    //
    // PERSISTED (r20): the ranked table feeds BOTH the bracketing join's
    // stream side and the target-rank derivation — unpersisted, the
    // window sort over the full input ran twice per call (and the
    // upstream derivation with it; e20 feeds this a join it would
    // otherwise recompute). Cache contract: the caller releases
    // (clearCache per query — the MinHashDedup/SpanDedup convention).
    val ranked = df.select(col(keyCol), col(valCol).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
      .withColumn("_rk", row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // group sizes off the ranked cache — one count-window column would
    // also work, but the aggregate reads the (tiny) cache, not the sort
    val counts = ranked.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
    // 0-based fractional position per (group, percentile); bracketing
    // 1-based ranks _lo/_hi. |groups|·|ps| rows — broadcast-sized.
    val targets = ps.map { case (nm, p) =>
      counts.select(col(keyCol).as("_k"), lit(nm).as("_p"),
        (lit(p) * (col("_n") - lit(1)).cast("double")).as("_pos"))
    }.reduce(_ unionAll _)
      .withColumn("_lo", floor(col("_pos")).cast("long") + 1)
      .withColumn("_hi", ceil(col("_pos")).cast("long") + 1)
    // null-SAFE key equality throughout: a NULL group key is a real group
    // to percentile()/quantile_cont (both window partitioning and groupBy
    // already treat NULL as one group), so the bracketing join and the
    // final re-join must not drop it the way `===` would
    val bracketed = ranked.join(broadcast(targets),
      col(keyCol) <=> col("_k") &&
        (col("_rk") === col("_lo") || col("_rk") === col("_hi")))
    val perP = bracketed
      .groupBy(col(keyCol), col("_p"), col("_pos"), col("_lo"), col("_hi"))
      .agg(
        max(when(col("_rk") === col("_lo"), col("_v"))).as("_lov"),
        max(when(col("_rk") === col("_hi"), col("_v"))).as("_hiv"))
      .withColumn("_val",
        when(col("_lo") === col("_hi"), col("_lov"))
          .otherwise(
            ((col("_hi") - lit(1)).cast("double") - col("_pos")) * col("_lov") +
              (col("_pos") - (col("_lo") - lit(1)).cast("double")) * col("_hiv")))
    val pivoted = perP.groupBy(col(keyCol))
      .pivot("_p", ps.map(_._1))
      .agg(first(col("_val")))
    // all-NULL groups were dropped by the isNotNull filter above; re-join
    // onto the distinct keys so they surface with NULL percentile columns
    // (the row set percentile()/quantile_cont produce)
    val pv = pivoted.withColumnRenamed(keyCol, "_pk")
    df.select(col(keyCol)).distinct()
      .join(pv, col(keyCol) <=> col("_pk"), "left")
      .drop("_pk")
      .orderBy(keyCol)
  }
}
