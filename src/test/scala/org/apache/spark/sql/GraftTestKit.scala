package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only accessor for `private[sql]` extension plumbing, so specs can
  * drive the exact registration path a `spark.sql.extensions` session
  * bootstrap runs. */
object GraftTestKit {
  def registerFunctions(ext: SparkSessionExtensions, reg: FunctionRegistry): Unit =
    ext.registerFunctions(reg)
}
