package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE merge-learning semantics: frequency-weighted argmax with the
  * (count DESC, pair ASC) tie-break, the 3-pass replace cascade that
  * fully merges adjacent pattern repetitions, and the documented
  * self-pair exclusion. The cross-engine exactness of the full 4-round
  * loop is pinned by the d32 oracle; these pin the operator contract. */
class BpeTrainSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("first merge is the count-weighted most frequent adjacent pair") {
    // "ab" appears 3x in "abc" + 2x in "abd" = 5; every other pair <= 3
    val m = BpeTrain.learnMerges(
      docs("abc abc abc abd", "abd xyz"), "text", 1)
    assert(m.map(x => (x.rank, x.left, x.right, x.weight)) ===
      Seq((1, "a", "b", 5L)))
  }

  test("adjacent pattern repetitions merge fully; self-pairs are never candidates") {
    // "ababab" = a b a b a b: pair (a,b) x3 per word. After a FULL merge
    // the word is "ab ab ab", whose only adjacent pair is the self-pair
    // (ab, ab) — excluded by contract — so learning must stop at exactly
    // one merge. A single-pass replace would leave "ab a b ab" (the
    // middle occurrence loses its shared delimiter) and a second round
    // would wrongly find (a, b) again.
    val m = BpeTrain.learnMerges(docs("ababab ababab"), "text", 3)
    assert(m.map(x => (x.rank, x.left, x.right, x.weight)) ===
      Seq((1, "a", "b", 6L)))
  }

  test("equal counts tie-break on the pair string") {
    // "ba" and "ab" both occur twice ("abab" has ab x2, ba x1; plus "ba"
    // word adds ba x1) → tie at 2; "a b" < "b a" lexicographically
    val m = BpeTrain.learnMerges(docs("abab ba"), "text", 1)
    assert(m.head.left === "a" && m.head.right === "b")
    assert(m.head.weight === 2L)
  }

  test("merged symbols participate in later rounds (multi-char pairs)") {
    // round 1 merges (a,b) (weight 4); round 2's best is then (ab, c)
    // from "abc" x3 — a pair whose left side is itself a merged symbol
    val m = BpeTrain.learnMerges(docs("abc abc abc ab"), "text", 2)
    assert(m.map(x => (x.left, x.right)) === Seq(("a", "b"), ("ab", "c")))
    assert(m.map(_.weight) === Seq(4L, 3L))
  }
}
