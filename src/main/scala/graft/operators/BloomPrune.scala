package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Bloom-pruned semi-join — "keep the fact rows whose key appears in a dim
  * set that is too big to broadcast". A plain left-semi join shuffles the
  * ENTIRE fact side on the key even when almost nothing matches; at 100 TB
  * the shuffle of non-matching rows is the whole cost. This operator
  * builds a bloom filter over the dim keys (~1.2 bytes/key at 1% fpp —
  * broadcastable when the dim itself is not), filters the fact scan
  * through a codegen'd `bloom_might_contain` probe so non-matching rows
  * die INSIDE the scan's whole-stage-codegen pipeline, and only then runs
  * the exact semi-join on the survivors: matched rows plus the ~fpp sliver
  * of false positives are all that ever reach the shuffle.
  *
  * The result is EXACTLY the plain semi-join (the bloom admits every true
  * match — no false negatives — and the exact join removes the false
  * positives), so the oracle replays it as `WHERE key IN (SELECT ...)`.
  * This is Spark's own runtime row-level-filter strategy
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) made explicit and
  * planner-independent: deterministic pruning you can compose, not a
  * runtime heuristic.
  *
  * Cost model: one dim pass to build the filter (driver holds ~1.2 B/key),
  * one fact scan with a per-row hash probe, then a semi-join whose build
  * side is the dim keys and whose probe side is |matches| + fpp·|fact|.
  */
object BloomPrune {

  /** Shared preamble: distinct long-cast dim keys (persisted — the dim
    * subtree is read three times: sizing count, filter build, join build
    * side; released by the caller's clearCache like every query-held
    * cache) and the serialized bloom over them. Distinct BEFORE
    * persisting: the bloom only cares about the key SET, and self-sizing
    * from total rows on a duplicate-heavy dim would allocate a filter
    * (and the serialized literal every task receives) proportional to
    * row count, not key count. Cast to long on BOTH sides so
    * stat.bloomFilter's putLong and the probe's mightContainLong agree
    * on the hashed representation. */
  private def keysAndBloom(dim: DataFrame, dimKey: String,
                           expectedItems: Long, fpp: Double)
      : (DataFrame, Array[Byte]) = {
    require(fpp > 0 && fpp < 1, s"need fpp in (0,1), got $fpp")
    val keys = dim.select(col(dimKey).cast("long").as(dimKey)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = keys.count() // materializes the cache; also the self-size
    val sized = if (expectedItems > 0) expectedItems else math.max(1L, n)
    val bloom = keys.stat.bloomFilter(dimKey, sized, fpp)
    (keys, BloomFunctions.serialize(bloom))
  }

  /** Rows of `fact` whose `factKey` appears in `dim`'s `dimKey` set.
    * `expectedItems`/`fpp` size the filter (standard bloom trade-off;
    * overshooting `expectedItems` bloats the literal that rides the plan
    * to every task, undershooting costs fpp); pass `expectedItems <= 0`
    * to self-size from a count of the dim side (one cheap extra job —
    * the right default when the dim is a filtered scan whose cardinality
    * the caller can't know ahead). Key columns must be integral and
    * distinctly named. */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = -1L,
               fpp: Double = 0.01): DataFrame = {
    require(factKey != dimKey,
      s"fact and dim key share the name '$factKey' — rename one side first")
    BloomFunctions.register(fact.sparkSession)
    val (keys, bytes) = keysAndBloom(dim, dimKey, expectedItems, fpp)
    fact
      .filter(BloomFunctions.bloomMightContain(col(factKey).cast("long"), bytes))
      .join(keys.hint("shuffle_hash"),
        col(factKey).cast("long") === col(dimKey), "left_semi")
  }

  /** Bloom-partitioned ANTI join — "keep the fact rows whose key does NOT
    * appear in the dim set" (the decontamination / blocklist shape at
    * scale). The bloom's one-sided error flips roles here: a key the
    * filter reports ABSENT is definitely absent, so that row's anti-join
    * membership is already decided INSIDE the scan and it bypasses the
    * join entirely; only the maybe-present sliver (true matches plus
    * ~fpp of the rest) runs the exact anti-join that clears the false
    * positives. At a selective blocklist the shuffle carries a few
    * percent of the fact side instead of all of it.
    *
    * Result is EXACTLY the plain left-anti join — including NULL keys:
    * a NULL (or uncastable) fact key never equals any dim key, so the
    * plain anti-join KEEPS the row, and the probe's NULL verdict is
    * coalesced into the bypass branch rather than silently failing both
    * filters. The oracle replays it as `WHERE key NOT IN (SELECT ...)`
    * over null-free keys. Same key contract as [[semiJoin]]. */
  def antiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = -1L,
               fpp: Double = 0.01): DataFrame = {
    require(factKey != dimKey,
      s"fact and dim key share the name '$factKey' — rename one side first")
    BloomFunctions.register(fact.sparkSession)
    val (keys, bytes) = keysAndBloom(dim, dimKey, expectedItems, fpp)
    val mightContain =
      BloomFunctions.bloomMightContain(col(factKey).cast("long"), bytes)
    // definitely-absent rows are decided at the scan; the sliver the
    // bloom flags runs the exact anti-join to clear false positives.
    // NULL probe verdicts (NULL/uncastable keys) take the bypass branch:
    // an anti-join keeps unmatched rows, and NULL matches nothing.
    fact.filter(coalesce(!mightContain, lit(true)))
      .unionByName(
        fact.filter(coalesce(mightContain, lit(false)))
          .join(keys.hint("shuffle_hash"),
            col(factKey).cast("long") === col(dimKey), "left_anti"))
  }
}
