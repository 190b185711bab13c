package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the single closest right row in the
  * same key group (the market-data / attribution primitive: pandas
  * `merge_asof`, DuckDB `ASOF JOIN`, kdb+ `aj`), in all three pandas
  * directions: backward (latest right at or before), forward (earliest
  * right at or after), nearest (whichever is closer; backward wins
  * ties). Spark has no native operator for it, and the naive encoding —
  * a range-condition join `l.key = r.key AND r.ts <= l.ts` followed by
  * an argmax — materializes |all rows in range| join output per left row
  * before collapsing it, which at data scale is a quadratic blowup on
  * active keys.
  *
  * Implementation is union + running window instead: tag both inputs,
  * union them, and per key carry the nearest right-side payload with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame (backward)
  * or `first(_, ignoreNulls)` over an unbounded-following frame
  * (forward). ONE shuffle on the key, a spillable window sort, no join
  * state and no intermediate pair explosion — the same execution shape
  * as sessionization (EventOps e3), so it scales the same way:
  * partition by key, sort within partition, stream. `nearest` computes
  * both carries over the SAME exchange (two Window operators, one
  * shuffle) and picks per row. The whole right payload travels as a
  * single struct, so every output column comes from the SAME matched
  * row even when right columns contain NULLs (per-column `last` calls
  * would tear rows apart).
  *
  * Tie semantics: equal timestamps match in every direction ("at or
  * before" / "at or after"). Duplicate right timestamps within a key
  * resolve deterministically — backward to the largest (valueCols)
  * tuple, forward to the smallest — where DuckDB's ASOF leaves the pick
  * unspecified.
  *
  * `toleranceUs` is pandas `merge_asof(tolerance=...)` parity: a match
  * farther than the tolerance (microseconds) nulls out instead of
  * joining.
  */
object AsofJoin {

  /** Tagged union: left rows carry their payload with NULL right slots,
    * right rows the reverse. `_side` = 1 for left, 0 for right. */
  private def tagged(left: DataFrame, right: DataFrame, keyCol: String,
                     tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one right column to carry")
    require(!left.columns.exists(_.startsWith("asof_")),
      "left columns must not collide with the asof_ output prefix")
    // internal working columns: withColumn silently REPLACES an existing
    // column of the same name, so an input column named _side/_m*/_mv or
    // _r_<valueCol> would corrupt the tagged-union carry instead of erroring
    val internal = Set("_side", "_m", "_mb", "_mf", "_mv") ++
      valueCols.map(c => s"_r_$c")
    val collisions = (left.columns ++ right.columns).toSet.intersect(internal)
    require(collisions.isEmpty,
      s"input columns collide with asof-join internal names: " +
        collisions.toSeq.sorted.mkString(", "))
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
    lSide.unionByName(rSide)
  }

  /** The carrier struct keeps (ts, payload...) atomic — one matched row. */
  private def carrier(tsCol: String, valueCols: Seq[String]): Column =
    when(col("_side") === 0,
      struct(col(tsCol).as("_ts") +: valueCols.map(c => col(s"_r_$c").as(c)): _*))

  /** Backward carry: right rows sort BEFORE left on timestamp ties
    * (at-or-before); duplicate right timestamps order by payload so the
    * largest tuple is carried. */
  private def backCarry(tsCol: String, valueCols: Seq[String], keyCol: String): Column = {
    val ord = Seq(col(tsCol).asc, col("_side").asc) ++
      valueCols.map(c => col(s"_r_$c").asc)
    last(carrier(tsCol, valueCols), ignoreNulls = true)
      .over(Window.partitionBy(col(keyCol)).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, 0))
  }

  /** Forward carry: left rows sort before right on ties (so an equal-ts
    * right row lands inside the following frame — at-or-after);
    * duplicate right timestamps carry the smallest payload tuple. */
  private def fwdCarry(tsCol: String, valueCols: Seq[String], keyCol: String): Column = {
    val ord = Seq(col(tsCol).asc, col("_side").desc) ++
      valueCols.map(c => col(s"_r_$c").asc)
    first(carrier(tsCol, valueCols), ignoreNulls = true)
      .over(Window.partitionBy(col(keyCol)).orderBy(ord: _*)
        .rowsBetween(0, Window.unboundedFollowing))
  }

  /** Age of a candidate match in microseconds (direction-aware sign). */
  private def age(tsCol: String, m: Column, backward: Boolean): Column =
    if (backward) unix_micros(col(tsCol)) - unix_micros(m.getField("_ts"))
    else unix_micros(m.getField("_ts")) - unix_micros(col(tsCol))

  private def withinTol(tsCol: String, m: Column, backward: Boolean,
                        toleranceUs: Option[Long]): Column =
    toleranceUs match {
      case Some(tol) => when(age(tsCol, m, backward) <= tol, m)
      case None => m
    }

  private def output(carried: DataFrame, left: DataFrame,
                     valueCols: Seq[String], matched: Column): DataFrame =
    carried.filter(col("_side") === 1)
      .withColumn("_mv", matched)
      .select(left.columns.toSeq.map(col) ++
        (col("_mv").getField("_ts").as("asof_ts") +:
          valueCols.map(c => col("_mv").getField(c).as(s"asof_$c"))): _*)

  /** Left rows with `asof_ts` (matched right timestamp) and one
    * `asof_<c>` column per carried right column; NULLs when no right row
    * qualifies (or the match exceeds the tolerance).
    *
    * @param keyCol    equality key present in both inputs
    * @param tsCol     event-time column present in both inputs
    * @param valueCols right columns to carry (must not collide with
    *                  `asof_`-prefixed left columns)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, valueCols: Seq[String],
                   toleranceUs: Option[Long] = None): DataFrame = {
    val carried = tagged(left, right, keyCol, tsCol, valueCols)
      .withColumn("_m", backCarry(tsCol, valueCols, keyCol))
    output(carried, left, valueCols,
      withinTol(tsCol, col("_m"), backward = true, toleranceUs))
  }

  /** Forward direction: earliest right row at or after each left row. */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, valueCols: Seq[String],
                  toleranceUs: Option[Long] = None): DataFrame = {
    val carried = tagged(left, right, keyCol, tsCol, valueCols)
      .withColumn("_m", fwdCarry(tsCol, valueCols, keyCol))
    output(carried, left, valueCols,
      withinTol(tsCol, col("_m"), backward = false, toleranceUs))
  }

  /** Nearest direction: the closer of the backward and forward matches
    * (backward wins exact-distance ties). Both carries share one
    * exchange — two Window operators over the same hash partitioning. */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, valueCols: Seq[String],
                  toleranceUs: Option[Long] = None): DataFrame = {
    val carried = tagged(left, right, keyCol, tsCol, valueCols)
      .withColumn("_mb", backCarry(tsCol, valueCols, keyCol))
      .withColumn("_mf", fwdCarry(tsCol, valueCols, keyCol))
    val b = withinTol(tsCol, col("_mb"), backward = true, toleranceUs)
    val f = withinTol(tsCol, col("_mf"), backward = false, toleranceUs)
    val pick = when(b.isNotNull && f.isNotNull,
        when(age(tsCol, col("_mb"), backward = true) <=
          age(tsCol, col("_mf"), backward = false), b).otherwise(f))
      .otherwise(coalesce(b, f))
    output(carried, left, valueCols, pick)
  }
}
