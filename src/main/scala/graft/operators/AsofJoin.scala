package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single latest right row
  * whose timestamp is at or before the left's, within the same key group
  * (the market-data / attribution primitive: pandas `merge_asof`, DuckDB
  * `ASOF JOIN`, kdb+ `aj`). Spark has no native operator for it, and the
  * naive encoding — a range-condition join `l.key = r.key AND r.ts <=
  * l.ts` followed by an argmax — materializes |all rows in range| join
  * output per left row before collapsing it, which at data scale is a
  * quadratic blowup on active keys.
  *
  * Implementation is union + running window instead: tag both inputs,
  * union them, and per key carry the most recent right-side payload
  * forward with `last(_, ignoreNulls)` over an unbounded-preceding frame.
  * ONE shuffle on the key, a spillable window sort, no join state and no
  * intermediate pair explosion — the same execution shape as
  * sessionization (EventOps e3), so it scales the same way: partition by
  * key, sort within partition, stream. The whole right payload travels as
  * a single struct, so every output column comes from the SAME matched
  * row even when right columns contain NULLs (per-column `last` calls
  * would tear rows apart).
  *
  * Tie semantics: right rows sort before left rows on equal timestamps,
  * giving "at or before" (a quote at exactly the trade's time matches).
  * Duplicate right timestamps within a key resolve to the largest
  * (valueCols) tuple — deterministic, where DuckDB's ASOF leaves the
  * pick unspecified.
  *
  * `toleranceUs` is pandas `merge_asof(tolerance=...)` parity: a match
  * older than the tolerance (microseconds) nulls out instead of joining.
  */
object AsofJoin {

  /** Left rows with `asof_ts` (matched right timestamp) and one
    * `asof_<c>` column per carried right column; NULLs when no right row
    * precedes the left row (or the match exceeds the tolerance).
    *
    * @param keyCol    equality key present in both inputs
    * @param tsCol     event-time column present in both inputs
    * @param valueCols right columns to carry (must not collide with
    *                  `asof_`-prefixed left columns)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, valueCols: Seq[String],
                   toleranceUs: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "asofBackward needs at least one right column to carry")
    require(!left.columns.exists(_.startsWith("asof_")),
      "left columns must not collide with the asof_ output prefix")
    val lPayload = left.columns.toSeq.filterNot(c => c == keyCol || c == tsCol)
    def nullAs(df: DataFrame, c: String): Column = lit(null).cast(df.schema(c).dataType)
    val lSide = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("_side")) ++
        lPayload.map(col) ++
        valueCols.map(c => nullAs(right, c).as(s"_r_$c")): _*)
    val rSide = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("_side")) ++
        lPayload.map(c => nullAs(left, c).as(c)) ++
        valueCols.map(c => col(c).as(s"_r_$c")): _*)
    // right rows first on ts ties (at-or-before), then by payload so
    // duplicate right timestamps pick a deterministic winner
    val ord = Seq(col(tsCol).asc, col("_side").asc) ++
      valueCols.map(c => col(s"_r_$c").asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // the carrier struct keeps (ts, payload...) atomic — one matched row
    val carrier = when(col("_side") === 0,
      struct(col(tsCol).as("_ts") +: valueCols.map(c => col(s"_r_$c").as(c)): _*))
    val carried = lSide.unionByName(rSide)
      .withColumn("_m", last(carrier, ignoreNulls = true).over(w))
    val matched = toleranceUs match {
      case Some(tol) =>
        when(unix_micros(col(tsCol)) - unix_micros(col("_m").getField("_ts")) <= tol,
          col("_m"))
      case None => col("_m")
    }
    carried.filter(col("_side") === 1)
      .withColumn("_mv", matched)
      .select(left.columns.toSeq.map(col) ++
        (col("_mv").getField("_ts").as("asof_ts") +:
          valueCols.map(c => col("_mv").getField(c).as(s"asof_$c"))): _*)
  }
}
