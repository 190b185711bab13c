package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

/** Exact-substring span dedup (d48): crafted corpora exercising the
  * interval-merge semantics the synthetic corpus never hits (its
  * near-dups are whole-document copies → always one span), plus a
  * brute-force replay over the sf0.001 documents table. */
class SpanDedupSpec extends AnyFunSuite {
  import SparkTestSession._

  private val L = 4 // small L keeps fixtures readable; the op is L-generic

  private def profile(docs: Seq[(Long, String)], minLen: Int = L)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    SpanDedup.spanProfile(docs.toDF("doc_id", "text"), "doc_id", "text", minLen)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  /** Brute force: position p of doc d is covered iff some L-gram of d
    * starting in [p-L+1, p] appears (as a word sequence) in another doc
    * — the identity the operator's gram-anchored form rides on. Spans
    * and the rollup re-derive from the covered set by direct scan. */
  private def brute(docs: Seq[(Long, String)], minLen: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    def gramsOf(ws: Seq[String]): Seq[Seq[String]] =
      if (ws.length < minLen) Seq.empty else ws.sliding(minLen).toSeq
    val gramDocs = toks.toSeq
      .flatMap { case (id, ws) => gramsOf(ws).distinct.map(g => g -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    docs.map { case (id, _) =>
      val ws = toks(id)
      val starts = gramsOf(ws).zipWithIndex.collect {
        case (g, j) if (gramDocs(g) - id).nonEmpty => j
      }
      val covered = starts.flatMap(j => j until j + minLen).toSet
      // spans = maximal runs of consecutive covered positions
      val runs = covered.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => e - s + 1L }
      val (nSpans, cov, longest) =
        if (runs.isEmpty) (0L, 0L, 0L)
        else (runs.size.toLong, runs.sum, runs.max)
      id -> ((ws.length.toLong, nSpans, cov, longest,
        1000000L * cov / ws.length))
    }.toMap
  }

  test("two disjoint shared passages stay two spans; overlap merges to one") {
    val a = "p1 p2 p3 p4 x1 x2 x3 x4 x5 q1 q2 q3 q4"   // 13 toks
    val docs = Seq(
      1L -> a,
      2L -> "p1 p2 p3 p4 other words here entirely",    // shares p-gram
      3L -> "before q1 q2 q3 q4 after that stuff")      // shares q-gram
    val got = profile(docs)
    // doc 1: [0,3] from the p-passage, [9,12] from the q-passage — two
    // spans, 8 covered of 13
    assert(got(1L) == ((13L, 2L, 8L, 4L, 615384L)), s"got ${got(1L)}")
    assert(got(2L) == ((8L, 1L, 4L, 4L, 500000L)))
    assert(got(3L) == ((8L, 1L, 4L, 4L, 500000L)))
    assert(got == brute(docs, L))
  }

  test("overlapping duplicated grams extend one span (the paper's span extension)") {
    // docs share a 6-word passage: starts 0..2 of the 4-grams all
    // duplicate, merging into ONE span of 6 — not three spans of 4
    val docs = Seq(
      1L -> "s1 s2 s3 s4 s5 s6 tail1 tail2",
      2L -> "head s1 s2 s3 s4 s5 s6 other")
    val got = profile(docs)
    assert(got(1L) == ((8L, 1L, 6L, 6L, 750000L)), s"got ${got(1L)}")
    assert(got(2L) == ((8L, 1L, 6L, 6L, 750000L)))
    assert(got == brute(docs, L))
  }

  test("a start gap of exactly L yields adjacent intervals — one span; L+1 breaks it") {
    // doc 1's duplicated 4-gram starts land at 0, 4, 5: intervals
    // [0,3], [4,7], [5,8] tile with no hole → ONE span of 9
    val merge = Seq(
      1L -> "a1 a2 a3 a4 z9 a1 a2 a3 a4 q5",
      2L -> "a1 a2 a3 a4 pad1 pad2 pad3 z9 a1 a2 a3 a4")
    val gm = profile(merge)
    assert(gm == brute(merge, L), s"got $gm")
    // disjoint starts 0 and 4+: [0,3] and [5,8] → two spans
    val split = Seq(
      1L -> "b1 b2 b3 b4 mid b5 b6 b7 b8",
      2L -> "b1 b2 b3 b4 x y z b5 b6 b7 b8")
    val gs = profile(split)
    assert(gs(1L)._2 == 2L && gs(2L)._2 == 2L, s"got $gs")
    assert(gs == brute(split, L))
  }

  test("short documents report zero coverage even when byte-identical") {
    val docs = Seq(
      1L -> "one two three",    // 3 toks < L: d1's catch, not a span
      2L -> "one two three",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8")
    val got = profile(docs)
    assert(got(1L) == ((3L, 0L, 0L, 0L, 0L)))
    assert(got(2L) == ((3L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((8L, 0L, 0L, 0L, 0L)))
    assert(got == brute(docs, L))
  }

  test("within-document repetition alone is NOT a span (cross-doc rule)") {
    val docs = Seq(
      1L -> "r1 r2 r3 r4 r1 r2 r3 r4", // repeats itself, shares nothing
      2L -> "entirely different words here now")
    val got = profile(docs)
    assert(got(1L) == ((8L, 0L, 0L, 0L, 0L)), s"got ${got(1L)}")
    assert(got == brute(docs, L))
  }

  test("d49 Gopher scorecard: duplicate lines, top-gram char mass, within-doc dup-5-gram coverage") {
    import spark.implicits._
    val docs = Seq(
      // 4 lines, one repeated twice more → 2 of 4 lines are duplicates
      1L -> "alpha beta\ngamma delta\nalpha beta\nalpha beta",
      // "w1 w2 w3 w4 w5" appears twice within the doc (starts 0 and 7,
      // gap 7 > 5) → two merged spans of 5 = 10 of 13 tokens covered;
      // top bigram "w1 w2" occurs twice (5 chars each)
      2L -> "w1 w2 w3 w4 w5 x y w1 w2 w3 w4 w5 z",
      // single line, no repeats at all
      3L -> "plain unique words only here")
    val got = graft.queries.TextOps.gopherRepetition(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val d1 = got(1L)
    assert(d1._3 == 500000L, s"dup_line_ppm: $d1") // 2 dup of 4 lines
    val d2 = got(2L)
    assert(d2._1 == 13L && d2._6 == 1000000L * 10L / 13L,
      s"dup5_token_ppm: $d2")
    // top bigram of doc 2: "w1 w2" ×2 → 2·5 chars of 33
    assert(d2._4 == 1000000L * 10L / d2._2, s"top2_char_ppm: $d2")
    val d3 = got(3L)
    assert(d3._3 == 0L && d3._6 == 0L, s"clean doc: $d3")
    // a doc with 1 token: no bigrams/trigrams/5-grams, nothing throws
    val tiny = graft.queries.TextOps
      .gopherRepetition(Seq(9L -> "solo").toDF("doc_id", "text"))
      .collect().head
    assert(tiny.getLong(4) == 0L && tiny.getLong(5) == 0L &&
      tiny.getLong(6) == 0L)
    spark.catalog.clearCache()
  }

  test("property: operator equals the covered-set brute force on random corpora") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // a 4-word vocabulary makes shared 3-grams COMMON, so the sampled
    // corpora hit real span structure (overlaps, adjacency, multi-span)
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.choose(0, 18).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val corpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, doc))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val prop = forAll(corpus) { docs => profile(docs, 3) == brute(docs, 3) }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
    spark.catalog.clearCache()
  }

  test("sf0.001 corpus: operator equals the brute-force replay at the d48 L") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    import spark.implicits._
    val got = SpanDedup.spanProfile(docs.toDF("doc_id", "text"),
        "doc_id", "text", 8)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val want = brute(docs, 8)
    assert(got == want,
      s"diff: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    spark.catalog.clearCache()
  }
}
