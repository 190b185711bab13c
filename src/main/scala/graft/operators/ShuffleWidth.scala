package graft.operators

import org.apache.spark.sql.SparkSession

/** JVM-wide registry of each session's UNTOUCHED shuffle width — the
  * value `spark.sql.shuffle.partitions` had before ANY graft component
  * narrowed it. Every narrower (the [[ConnectedComponents]] loop, the
  * per-batch bodies behind `StreamOps.withBatchShuffleWidth`) records
  * here BEFORE its first `conf.set`, so a session's first recording can
  * never capture another component's transient narrow as if it were the
  * deployment default — the permanent-pinning failure a first-call race
  * between two streams on one session would otherwise produce.
  *
  * Keys are WEAK (a synchronized [[java.util.WeakHashMap]] — its
  * `computeIfAbsent` runs inside the wrapper's mutex): a long-running
  * deployment cycles `newSession()` per stream, and a strong-keyed map
  * would pin every dead session's `SessionState` forever.
  */
private[graft] object ShuffleWidth {

  private val PartsKey = "spark.sql.shuffle.partitions"

  private val recorded: java.util.Map[SparkSession, String] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** The session's untouched width, recording the CURRENT width on
    * first touch. Narrowers MUST call this before their first
    * `conf.set` on the session; restores target this value. */
  def untouched(spark: SparkSession): String =
    recorded.computeIfAbsent(spark, s => s.conf.get(PartsKey))
}
