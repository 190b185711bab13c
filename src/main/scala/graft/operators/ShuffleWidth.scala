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
  *
  * CAVEAT (documented contract): the recording is the FIRST width ever
  * observed for the session — an application that deliberately re-sets
  * `spark.sql.shuffle.partitions` on a session already touched by graft
  * components will have that change reverted by the next gate or CC
  * restore. Call [[invalidate]] after such a change so the next
  * narrower re-records the new deployment default.
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

  /** Forget the session's recording: the next narrower re-records
    * whatever width the session carries THEN. For applications that
    * deliberately change `spark.sql.shuffle.partitions` mid-life —
    * without this, every later graft restore would silently revert the
    * session to the stale first-observed value. Only call while no
    * graft narrower is in flight on the session (an in-flight narrow
    * would then record its own transient width as the new default —
    * the exact failure the first-touch rule exists to prevent). */
  def invalidate(spark: SparkSession): Unit = recorded.remove(spark)
}
