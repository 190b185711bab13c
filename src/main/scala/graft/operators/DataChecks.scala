package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the constraint report a pipeline
  * gate evaluates before promoting a snapshot (the Deequ/Great-
  * Expectations category, expressed as one Spark aggregate): each check
  * contributes a violation-count expression, ALL checks evaluate in a
  * SINGLE pass over the table (one partial-aggregating scan, no shuffle
  * beyond the 1-row final agg), and the report is one row per check with
  * its violation count.
  *
  * Counts are plain integers, so the DuckDB oracle replays the whole
  * report exactly; uniqueness is the one check that needs its own
  * aggregate (a count-distinct), kept as a separate small job rather than
  * forcing an Expand into the single-pass scan.
  */
object DataChecks {

  sealed trait Check {
    def name: String
    def column: String
  }
  /** `column IS NOT NULL` for every row. */
  case class NotNull(column: String) extends Check { val name = "not_null" }
  /** Values fall in [lo, hi] (NULLs don't violate — pair with NotNull).
    * Bounds must be finite: Infinity/NaN stringify into SQL the oracle
    * can't parse while the Spark side evaluates fine, so the mismatch
    * would only surface at replay time — reject it at construction
    * (one-sided ranges: use a Satisfies check instead). */
  case class InRange(column: String, lo: Double, hi: Double) extends Check {
    require(!lo.isNaN && !lo.isInfinite && !hi.isNaN && !hi.isInfinite,
      s"InRange($column) bounds must be finite, got [$lo, $hi]")
    val name = "in_range"
  }
  /** Values belong to the accepted set (NULLs don't violate). The set
    * must be non-empty: an empty set would flag every non-null row on
    * the Spark side while generating unparseable `NOT IN ()` SQL on the
    * oracle side — reject the ambiguity at construction. */
  case class InSet(column: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, s"InSet($column) needs at least one accepted value")
    val name = "in_set"
  }
  /** An arbitrary row-level predicate that must hold (engine-portable SQL
    * — same text runs in Spark and the oracle). */
  case class Satisfies(column: String, predicateSql: String, label: String)
      extends Check { val name = s"satisfies_$label" }
  /** No two rows share a value of `column`. */
  case class Unique(column: String) extends Check { val name = "unique" }

  private def violations(c: Check): Column = c match {
    case NotNull(col0) => sum(when(col(col0).isNull, 1L).otherwise(0L))
    case InRange(col0, lo, hi) =>
      sum(when(col(col0).isNotNull &&
        (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L))
    case InSet(col0, vs) =>
      sum(when(col(col0).isNotNull &&
        !col(col0).isin(vs: _*), 1L).otherwise(0L))
    case Satisfies(_, pred, _) =>
      sum(when(!expr(pred), 1L).otherwise(0L))
    case Unique(_) => lit(null) // handled separately
  }

  /** SQL twin of [[violations]] for the oracle replay. */
  def violationsSql(c: Check): String = c match {
    case NotNull(col0) =>
      s"SUM(CASE WHEN $col0 IS NULL THEN 1 ELSE 0 END)"
    case InRange(col0, lo, hi) =>
      s"SUM(CASE WHEN $col0 IS NOT NULL AND ($col0 < $lo OR $col0 > $hi) THEN 1 ELSE 0 END)"
    case InSet(col0, vs) =>
      val set = vs.map(v => s"'${v.replace("'", "''")}'").mkString(", ")
      s"SUM(CASE WHEN $col0 IS NOT NULL AND $col0 NOT IN ($set) THEN 1 ELSE 0 END)"
    case Satisfies(_, pred, _) =>
      s"SUM(CASE WHEN NOT ($pred) THEN 1 ELSE 0 END)"
    case Unique(col0) =>
      s"COUNT($col0) - COUNT(DISTINCT $col0)"
  }

  /** The validation report: (check, column, n_violations, passed), one row
    * per check, ordered by (check, column). All non-unique checks share
    * one aggregating scan; each Unique check adds one count-distinct
    * aggregate over its column. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val spark = df.sparkSession
    import spark.implicits._
    val scanChecks = checks.filter(!_.isInstanceOf[Unique])
    val uniqueChecks = checks.collect { case u: Unique => u }
    val scanned: Seq[(String, String, Long)] = if (scanChecks.nonEmpty) {
      val row = df.agg(violations(scanChecks.head).as("c0"),
        scanChecks.tail.zipWithIndex.map { case (c, i) =>
          violations(c).as(s"c${i + 1}") }: _*).head
      scanChecks.zipWithIndex.map { case (c, i) =>
        (c.name, c.column, if (row.isNullAt(i)) 0L else row.getLong(i))
      }
    } else Nil
    val uniqued: Seq[(String, String, Long)] = uniqueChecks.map { u =>
      val row = df.agg(
        (count(col(u.column)) - countDistinct(col(u.column))).as("d")).head
      (u.name, u.column, row.getLong(0))
    }
    (scanned ++ uniqued)
      .toDF("check", "column", "n_violations")
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("check", "column")
  }
}
