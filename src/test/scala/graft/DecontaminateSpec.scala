package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontaminate

/** Benchmark decontamination: crafted corpora covering the shared-gram
  * counting semantics, the short-document whole-text-gram path, the clean
  * corpus (empty report), and the broadcast-join plan shape. */
class DecontaminateSpec extends AnyFunSuite {
  import SparkTestSession._

  private def report(corpus: Seq[(Long, String)], eval: Seq[(Long, String)],
                     n: Int = 3): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Decontaminate.contamination(
        corpus.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("shared n-grams count distinct grams and distinct eval docs hit") {
    val corpus = Seq(
      // shares "the quick brown" and "quick brown fox" with eval 1,
      // and "lazy dog sleeps" with eval 2 → 3 grams, 2 eval docs
      (100L, "the quick brown fox and lazy dog sleeps here"),
      // repeats its contaminated gram — distinct-gram count must stay 1
      (101L, "lazy dog sleeps lazy dog sleeps"),
      (102L, "completely different words in this document"))
    val eval = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a lazy dog sleeps soundly"))
    val got = report(corpus, eval)
    assert(got == Map(100L -> (3L, 2L), 101L -> (1L, 1L)),
      s"got $got")
  }

  test("documents shorter than n tokens sweep via the whole-text gram") {
    // both sides are 2 tokens < n=3, so each contributes its whole text
    // as one gram; an exact short-text match must be flagged, not
    // silently exempted
    val got = report(
      corpus = Seq((100L, "tiny doc"), (101L, "other text")),
      eval = Seq((1L, "tiny doc")))
    assert(got == Map(100L -> (1L, 1L)), s"got $got")
  }

  test("a clean corpus produces an empty report") {
    val got = report(
      corpus = Seq((100L, "alpha beta gamma delta"), (101L, "one two three four")),
      eval = Seq((1L, "epsilon zeta eta theta")))
    assert(got.isEmpty, s"expected no contamination, got $got")
  }

  test("the eval side broadcasts — the corpus join is map-side") {
    import spark.implicits._
    val df = Decontaminate.contamination(
      (0L until 200L).map(i => (i, s"filler words number $i go here")).toDF("doc_id", "text"),
      Seq((1L, "filler words number 7 go here")).toDF("doc_id", "text"),
      "doc_id", "text", 3)
    df.collect()
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side must broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"))
  }
}
