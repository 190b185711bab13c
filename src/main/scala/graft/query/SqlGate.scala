package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, ParsedStatement}

/** Read-only SQL passthrough — the plan-level replacement for the
  * reference's `SELECT`/`PRAGMA` string-prefix gates
  * (`Billion_Dollar/server.py:37-39`, `era5server.py:46-48`). Prefix
  * checks are trivially bypassed (`WITH x AS (...) DELETE ...`,
  * comments, whitespace); inspecting the *parsed* logical plan is not:
  * any Command (DDL/DML/SET/...) or insert is rejected before analysis.
  */
object SqlGate {

  case class RejectedStatement(reason: String)
      extends SecurityException(reason)

  private def commands(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect {
      case c: Command => c
      case i: InsertIntoStatement => i
    }

  /** Parse without executing; throw [[RejectedStatement]] unless the
    * statement is a pure query. */
  def check(spark: SparkSession, sql: String): Unit = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val found = commands(plan)
    if (found.nonEmpty)
      throw RejectedStatement(
        s"only read-only queries are allowed; got ${found.head.nodeName}")
    // ParsedStatement subclasses that aren't Commands yet (pre-analysis
    // DDL shapes) are also non-queries
    plan.collect { case p: ParsedStatement => p }.headOption.foreach { p =>
      throw RejectedStatement(s"only read-only queries are allowed; got ${p.nodeName}")
    }
  }

  /** Gate + execute. */
  def query(spark: SparkSession, sql: String): DataFrame = {
    check(spark, sql)
    spark.sql(sql)
  }
}
