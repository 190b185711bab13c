package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation surface — the sketches a 100 TB deployment
  * actually runs when exactness is negotiable (SURVEY §2.4 statistics
  * surface, scale tier):
  *
  *   - `approx_count_distinct` (HyperLogLog++): O(1) state per group vs
  *     the exact two-phase expand whose shuffle carries every distinct
  *     (group, value) pair — the difference between a metrics query that
  *     runs in seconds and one that reshuffles the corpus;
  *   - `approx_percentile` (quantile sketch): bounded state vs
  *     `percentile()`'s whole-group buffer (see
  *     [[DistributedPercentile]] for the exact-but-scalable middle
  *     ground).
  *
  * These are deliberately NOT oracle-checked: sketch internals are
  * engine-private, so DuckDB cannot replay them value-for-value (NOTES
  * "approx sketches do NOT match"). Their contract is accuracy-bounded
  * instead, and ApproxOpsSpec pins the error envelope against the exact
  * answers on testdata.
  */
object ApproxOps {

  /** Per-group approximate distinct count next to the exact one the
    * caller can cross-check on samples. `rsd` is HLL++'s target relative
    * standard deviation (default 5%). */
  def approxDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_${valueCol}"))

  /** Per-group approximate percentiles; `accuracy` trades state size for
    * rank error (err <= 1/accuracy of the rank). */
  def approxPercentiles(df: DataFrame, keyCols: Seq[String], valueCol: String,
                        ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(ps.map(lit): _*), lit(accuracy)).as("approx_ps"))
}
