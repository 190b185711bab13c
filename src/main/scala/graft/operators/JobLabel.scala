package graft.operators

import org.apache.spark.sql.SparkSession

/** Job-description scoping (guide §1.5 — label your jobs): wraps a
  * driver-side section so every Spark job it submits carries `desc` in
  * the UI / QueryDiag job table, restoring the enclosing label on exit.
  * Descriptions are thread-local on the driver, so nested and concurrent
  * sections compose. */
object JobLabel {
  def apply[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(prev)
  }
}
