package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Min-label-propagation connected components: fixture graphs covering
  * every shape a near-dup edge list produces (star, chain, singleton
  * self-edge, duplicate + both-orientation edges), the fail-fast on
  * non-convergence at maxRounds, deterministic cache release, and the
  * bounded-plan-growth property of the periodic localCheckpoint (the
  * maxRounds=50 worst case must not stack 50 plan generations).
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def labelsOf(edges: Seq[(Long, Long)],
                       maxRounds: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("id_a", "id_b"), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("star, chain, singleton and duplicate edges resolve to min-id components") {
    val edges = Seq(
      // star: center 10 with leaves
      (10L, 11L), (10L, 12L), (13L, 10L),
      // chain: 5-6-7 (needs propagation through the middle vertex)
      (5L, 6L), (7L, 6L),
      // singleton via self-edge
      (99L, 99L),
      // duplicate edge + reversed orientation of an existing edge
      (10L, 11L), (11L, 10L))
    assert(labelsOf(edges) == Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      99L -> 99L))
  }

  test("star identity: incremental CC over (stars of old labels) ∪ new edges equals from-scratch (c13's contract)") {
    import spark.implicits._
    // old history: two separate components {1,2,3} and {10,11}, plus an
    // untouched component {20,21}
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    // increment: a NEW vertex joins one component (12→10-cluster), and —
    // the adversarial case — a new edge MERGES the two old components
    // through their non-min members (3–11): the star collapse must still
    // produce the global min label 1 for everything reachable
    val fresh = Seq((12L, 11L), (3L, 11L), (30L, 31L))
    val scratch = labelsOf(old ++ fresh)
    val stars = labelsOf(old).toSeq.filter { case (id, c) => id != c }
    val incremental = labelsOf(stars ++ fresh)
    assert(incremental == scratch)
    assert(scratch(12L) == 1L && scratch(11L) == 1L, "merge must reach global min")
    assert(scratch(20L) == 20L && scratch(21L) == 20L, "untouched component survives the collapse")
  }

  test("two components never merge; every vertex gets exactly one label") {
    val edges = Seq((1L, 2L), (2L, 3L), (100L, 101L))
    val got = labelsOf(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 100L -> 100L, 101L -> 100L))
    assert(got.keySet.size == 5, "one row per vertex, no duplicates")
  }

  test("hitting maxRounds without converging throws instead of returning bad labels") {
    // chain 0-1-…-9: vertex 9 needs 9 rounds to learn label 0, so
    // maxRounds=3 must fail fast rather than hand back a half-propagated
    // labeling that would split the cluster
    val chain = (0L until 9L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] { labelsOf(chain, maxRounds = 3) }
    assert(ex.getMessage.contains("did not converge"))
    // the same chain converges fine with headroom
    assert(labelsOf(chain).values.toSet == Set(0L))
  }

  test("withComponents releases every cache it created") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = ConnectedComponents.withComponents(
      Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")) { labels =>
      labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDD ids: $leaked")
  }

  test("incrementalStepWith releases every cache it created (per-micro-batch contract)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val prev = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    // the new edge merges {1,2} with {3}: star (2→1) ∪ edge (2,3)
    val out = ConnectedComponents.incrementalStepWith(prev,
      Seq((2L, 3L)).toDF("id_a", "id_b")) { labels =>
      labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // Dataset.unpersist is non-blocking, and a round that lands on the
    // CheckpointEvery cadence leaves a localCheckpoint cache that only
    // the ContextCleaner frees once the frame is unreferenced — so the
    // contract is "nothing SURVIVES GC", not "nothing appears": poll
    // with GC nudges until the CacheManager drains back to the baseline
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.nanoTime() + 15000000000L
    while (leaked().nonEmpty && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(leaked().isEmpty, s"leaked persistent RDD ids: ${leaked()}")
  }

  test("long-diameter chain: plan growth stays bounded by the checkpoint cadence") {
    import spark.implicits._
    // 25 vertices in a chain → 24 propagation rounds + 1 convergence
    // round: crosses the localCheckpoint cadence (8) three times. Without
    // truncation the final plan would stack all ~25 join+agg generations;
    // with it, at most CheckpointEvery generations sit above a leaf.
    val n = 24
    val chain = (0L until n.toLong).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = ConnectedComponents.components(chain)
    assert(labels.collect().map(_.getLong(1)).toSet == Set(0L),
      "whole chain must collapse to component 0")
    val planLen = labels.queryExecution.optimizedPlan.toString.length
    assert(planLen < 60000,
      s"optimized plan is $planLen chars — lineage not truncated?")
  }
}
