package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusShaping

/** Corpus shaping: deterministic stratified sampling semantics (exact
  * rates 0 and 1, determinism, content keying, default fallback) and
  * fixed-window token chunking (window boundaries, partial final chunk,
  * md5 identity), plus the zero-shuffle plan property both claim. */
class CorpusShapingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  test("stratified sampling: rate 0 drops the stratum, rate 1 keeps it whole") {
    val d = docs((1L, "en", "alpha"), (2L, "en", "beta"), (3L, "de", "gamma"),
      (4L, "fr", "delta"))
    val kept = CorpusShaping.stratifiedByHash(d, "lang", "text",
        Map("en" -> 0.0, "de" -> 1.0), defaultRate = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L), s"got $kept")
  }

  test("stratified sampling is deterministic and content-keyed") {
    val d = docs((1L, "en", "same text"), (2L, "en", "same text"),
      (3L, "en", "other words"), (4L, "en", "third body"))
    def run() = CorpusShaping.stratifiedByHash(d, "lang", "text", Map("en" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = run()
    assert(run() == first, "same input must sample identically across runs")
    // exact duplicates share the content hash: both or neither survive
    assert(first.contains(1L) == first.contains(2L),
      s"duplicate texts split across the sample boundary: $first")
  }

  test("stratified sampling approximates its rates on real data") {
    val d = Tables(spark, sfDir, "documents")
    val total = d.filter(col("lang") === "en").count().toDouble
    val kept = CorpusShaping.stratifiedByHash(d, "lang", "text", Map("en" -> 0.3))
      .filter(col("lang") === "en").count().toDouble
    val frac = kept / total
    assert(frac > 0.1 && frac < 0.5, s"en keep fraction $frac far from 0.3")
  }

  test("token chunks: window boundaries, partial final chunk, md5 identity") {
    val d = docs((1L, "en", "a b c d e"), (2L, "en", "x y"), (3L, "en", "solo"))
    val got = CorpusShaping.tokenChunks(d, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      (1L, 0L, 2, m("a b")), (1L, 1L, 2, m("c d")), (1L, 2L, 1, m("e")),
      (2L, 0L, 2, m("x y")),
      (3L, 0L, 1, m("solo"))), got.mkString(", "))
  }

  test("both shaping operators plan zero exchanges (row-local)") {
    val d = Tables(spark, sfDir, "documents")
    val sampled = CorpusShaping.stratifiedByHash(d, "lang", "text", Map("en" -> 0.3))
    sampled.collect()
    assert(!sampled.queryExecution.executedPlan.toString.contains("Exchange"),
      "sampling must not shuffle")
    val chunked = CorpusShaping.tokenChunks(d, "doc_id", "text", 32)
    chunked.collect()
    assert(!chunked.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking must not shuffle")
  }

  test("token chunk counts reconcile with document token counts") {
    val d = Tables(spark, sfDir, "documents")
    val fromChunks = CorpusShaping.tokenChunks(d, "doc_id", "text", 32)
      .agg(sum(col("n_tokens"))).head.getLong(0)
    val direct = d.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(fromChunks == direct, s"chunked $fromChunks vs direct $direct tokens")
  }

  test("capPerStratum keeps exactly k per stratum and equals the single-window cap") {
    import org.apache.spark.sql.expressions.Window
    val d = docs((1L to 60L).map(i =>
      (i, if (i <= 45) "en" else "de", s"doc body number $i")): _*)
    val got = CorpusShaping.capPerStratum(d, "lang", "doc_id", "text", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val counts = CorpusShaping.capPerStratum(d, "lang", "doc_id", "text", 10)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("en" -> 10L, "de" -> 10L), counts.toString)
    // the salted two-phase must equal the plain single-window statement
    val w = Window.partitionBy(col("lang"))
      .orderBy(graft.operators.PortableHash.hex60(col("text")), col("doc_id"))
    val want = d.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"two-phase $got vs single-window $want")
  }

  test("capPerStratum passes small strata through whole") {
    val d = docs((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"))
    val n = CorpusShaping.capPerStratum(d, "lang", "doc_id", "text", 10).count()
    assert(n == 3L)
  }

  test("packSequences matches a sequential reference and is invariant to nParts") {
    val d = docs((1L to 50L).map(i =>
      (i * 3L, "en", Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))): _*)
    def run(p: Int) = CorpusShaping.packSequences(d, "doc_id", "text", 10, p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val got = run(4)
    // sequential reference: concatenate in id order, label by starting pack
    var cum = 0L
    val want = (1L to 50L).map { i =>
      val nt = (i % 7 + 1)
      val start = cum; cum += nt
      (i * 3L, nt, start / 10L)
    }
    assert(got == want, s"got ${got.take(5)}... want ${want.take(5)}...")
    assert(run(1) == got && run(7) == got,
      "pack assignment must not depend on the bin count")
    spark.catalog.clearCache()
  }

  test("mixToTokenTargets derives exact integer buckets and rebalances toward the weights") {
    // en: 40 docs x 10 tokens = 400; de: 10 docs x 10 tokens = 100.
    // equal weights -> kmin = 100, en bucket = 100*10000/400 = 2500 (25%),
    // de bucket = 10000 (keep all)
    val d = docs(
      ((1L to 40L).map(i => (i, "en", Seq.fill(10)(s"w$i").mkString(" "))) ++
       (41L to 50L).map(i => (i, "de", Seq.fill(10)(s"w$i").mkString(" ")))): _*)
    val kept = CorpusShaping.mixToTokenTargets(d, "lang", "text",
      Map("en" -> 1L, "de" -> 1L))
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // de keeps everything (its bucket is exactly 10000)
    assert(byLang.getOrElse("de", 0L) == 10L, byLang.toString)
    // en keeps ~25% by content hash — sampling variance, but strictly a
    // real downsample and no more than half
    val en = byLang.getOrElse("en", 0L)
    assert(en >= 1L && en <= 20L, s"en kept $en of 40 at a 25% rate")
    // deterministic
    val again = CorpusShaping.mixToTokenTargets(d, "lang", "text",
      Map("en" -> 1L, "de" -> 1L)).count()
    assert(again == kept.count())
    // unweighted strata are dropped
    val partial = CorpusShaping.mixToTokenTargets(d, "lang", "text",
      Map("de" -> 1L))
    assert(partial.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("de"))
  }

  test("packSequences on an empty corpus returns an empty frame") {
    val d = docs().select(col("doc_id"), col("lang"), col("text"))
    assert(CorpusShaping.packSequences(d, "doc_id", "text", 10).count() == 0L)
  }

  test("curriculumInterleave: dense per-epoch permutations, byte-identical " +
      "re-runs, epoch-seeded shuffles, and by-construction even interleave") {
    import spark.implicits._
    // strata A (8 docs) and B (4 docs): the fractional-key construction
    // makes the stratum SEQUENCE deterministic regardless of which doc
    // the hash puts at each rank — A at (2r+1)/16, B at (2r+1)/8 merge
    // to A B A A B A A B A A B A, exactly every third slot a B
    val d = ((1L to 8L).map(i => (i, "A")) ++ (9L to 12L).map(i => (i, "B")))
      .toDF("doc_id", "lang")
    val out = CorpusShaping.curriculumInterleave(d, "doc_id", "lang", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out.length == 24)
    (0L to 1L).foreach { e =>
      val ep = out.filter(_._1 == e).sortBy(_._2)
      assert(ep.map(_._2).toSeq == (0L until 12L).toSeq,
        s"epoch $e positions not dense: ${ep.map(_._2).toSeq}")
      assert(ep.map(_._3).toSet == (1L to 12L).toSet,
        s"epoch $e is not a permutation")
      assert(ep.map(_._4).toSeq == Seq("A", "B", "A", "A", "B", "A",
        "A", "B", "A", "A", "B", "A"),
        s"epoch $e stratum sequence broke the interleave: ${ep.map(_._4).toSeq}")
    }
    // epochs are DIFFERENT shuffles of the same multiset (the hash is
    // epoch-seeded) — with 8! orderings of A a collision is negligible
    val orders = (0L to 1L).map(e =>
      out.filter(_._1 == e).sortBy(_._2).map(_._3).toSeq)
    assert(orders(0) != orders(1), "epoch orders must differ")
    // byte-identical re-run (and partitioning-independent: force a
    // different bin width via nParts)
    val again = CorpusShaping.curriculumInterleave(d, "doc_id", "lang", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(again.sortBy(x => (x._1, x._2)).toSeq ==
      out.sortBy(x => (x._1, x._2)).toSeq)
    val narrow = CorpusShaping
      .curriculumInterleave(d, "doc_id", "lang", 2, nParts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(narrow.sortBy(x => (x._1, x._2)).toSeq ==
      out.sortBy(x => (x._1, x._2)).toSeq,
      "a different two-phase bin width changed the order")
  }
}
