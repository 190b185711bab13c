package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import SparkTestSession._

  test("languageId classifies obvious English/Spanish/German text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog went into the forest of kings"),
      (2L, "la casa de la abuela es el lugar de los recuerdos en el pueblo"),
      (3L, "die kinder spielen in der schule und singen ein schoenes lied"),
      (4L, "zzz qqq xxx 123")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en", got.toString)
    assert(got(2L) == "es", got.toString)
    assert(got(3L) == "de", got.toString)
    assert(got(4L) == "unknown", got.toString)
  }

  test("languageId score ties break to the lexically largest language code") {
    import spark.implicits._
    // trigrams of "xthex yy lax": exactly one en hit ("the") and one es hit
    // (" la"), zero de hits — a genuine 1-1 score tie; greatest over
    // (score, lang) structs resolves it to the larger code, "es"
    val docs = Seq((1L, "xthex yy lax")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(docs, "doc_id", "text").collect()(0)
    assert(got.getInt(2) == 1, s"expected score 1, got $got")
    assert(got.getString(1) == "es", s"tie must resolve reverse-alphabetically, got $got")
  }

  test("bpeTokenCount splits symbols and digit runs into their own tokens") {
    import spark.implicits._
    val df = Seq(("hello, world 42!")).toDF("text")
      .select(TextAnalysis.bpeTokenCount(col("text")).as("n"))
    // tokens: hello , world 42 !  -> 5
    assert(df.collect()(0).getInt(0) == 5)
  }

  test("rollingHash is order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq(("abc"), ("acb"), ("abc")).toDF("text")
      .select(TextAnalysis.rollingHash(col("text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(2))
    assert(hs(0) != hs(1), "transposition must change the hash")
    // Horner check: ((0*31+97)*31+98)*31+99
    assert(hs(0) == ((97L * 31 + 98) * 31 + 99))
  }

  test("languageId runs over the documents table without error") {
    val out = TextAnalysis.languageId(Tables(spark, sfDir, "documents"), "doc_id", "text")
    assert(out.count() == 500)
    assert(out.select("pred_lang").distinct().count() >= 1)
  }

  test("d51 Gopher quality battery: every rule trips on its crafted fixture " +
      "and a clean long doc passes") {
    import spark.implicits._
    // the corpus is single-line and clean, so the degenerate signals are
    // exercised here (the d49 convention). One doc per rule:
    val cleanWords = (1 to 60).map(i => Seq("the", "be", "to", "of", "and",
      "that", "have", "with", "word", "token")(i % 10))
    val docs = Seq(
      1L -> cleanWords.mkString(" "),                       // passes everything
      2L -> "the be ### of ## and # that",                  // symbol-heavy
      3L -> (1 to 6).map(i => s"- bullet item $i").mkString("\n"), // all bullets
      4L -> (1 to 6).map(i => s"line $i trails off...").mkString("\n"), // ellipses
      5L -> "zz1 942 771 x9 00 11 22 33",                   // no stops, few alpha
      6L -> (1 to 60).map(_ => "a").mkString(" "),          // mean word len < 3
      7L -> "the be to of and that have with"               // too few words
    ).toDF("doc_id", "text")
    val got = graft.queries.TextOps.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 60 words, stops present, alpha 100%, no symbols → pass
    assert(got(1L).getAs[Long]("gopher_pass") == 1L, s"${got(1L)}")
    assert(got(1L).getAs[Long]("alpha_word_ppm") == 1000000L)
    assert(got(1L).getAs[Long]("stopword_hits") == 8L)
    // doc 2: 6 '#' over 8 words = 750000 ppm > 100000 → fail
    assert(got(2L).getAs[Long]("symbol_ppm") == 1000000L * 6 / 8, s"${got(2L)}")
    assert(got(2L).getAs[Long]("gopher_pass") == 0L)
    // doc 3: 6/6 bullet lines
    assert(got(3L).getAs[Long]("bullet_line_ppm") == 1000000L, s"${got(3L)}")
    assert(got(3L).getAs[Long]("gopher_pass") == 0L)
    // doc 4: 6/6 ellipsis lines; each '...' also counts as one symbol.
    // Space-split words: 18 spaces → 19 words (the '\n' join points merge
    // "off...\nline" into one word — the split-on-space convention)
    assert(got(4L).getAs[Long]("ellipsis_line_ppm") == 1000000L, s"${got(4L)}")
    assert(got(4L).getAs[Long]("symbol_ppm") == 1000000L * 6 / 19, s"${got(4L)}")
    // doc 5: zero stop words; alpha words 2 of 8
    assert(got(5L).getAs[Long]("stopword_hits") == 0L, s"${got(5L)}")
    assert(got(5L).getAs[Long]("alpha_word_ppm") == 1000000L * 2 / 8)
    assert(got(5L).getAs[Long]("gopher_pass") == 0L)
    // doc 6: mean word length 1.00 (c100 = 100) < 300 → fail
    assert(got(6L).getAs[Long]("mean_word_len_c100") == 100L, s"${got(6L)}")
    assert(got(6L).getAs[Long]("gopher_pass") == 0L)
    // doc 7: 8 words < 50 → fail on count alone (all else clean)
    assert(got(7L).getAs[Long]("n_words") == 8L &&
      got(7L).getAs[Long]("gopher_pass") == 0L, s"${got(7L)}")
  }

  test("d52 composed Gopher verdict: each half gates independently and " +
      "kept is their conjunction") {
    import spark.implicits._
    val docs = Seq(
      // 60 distinct 3-char words incl. two stops: passes BOTH halves
      1L -> (Seq("the", "and") ++ (3 to 60).map(i => f"w$i%02d")).mkString(" "),
      // one 2-gram repeated 30x: repetition fails (top2 char share ~90%),
      // quality passes (60 words, mean len 400, stops that/have)
      2L -> Seq.fill(30)("that have").mkString(" "),
      // 60 distinct words, ZERO stop words: quality fails, repetition passes
      3L -> (1 to 60).map(i => f"w$i%02d").mkString(" "),
      // short-word loop: repetition fails AND mean word length 225 < 300
      4L -> Seq.fill(15)("the be to of").mkString(" ")
    ).toDF("doc_id", "text")
    val got = graft.queries.TextOps.gopherVerdict(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    spark.catalog.clearCache() // gopherRepetition's positional-gram cache
    assert(got(1L) == ((1L, 1L, 1L)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((0L, 1L, 0L)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((1L, 0L, 0L)), s"doc3 ${got(3L)}")
    assert(got(4L) == ((0L, 0L, 0L)), s"doc4 ${got(4L)}")
  }

  test("CDC chunking is LOCAL: an insertion only perturbs its own neighborhood") {
    import spark.implicits._
    // deterministic pseudo-random text, long enough for many ~64-char chunks
    val rnd = new scala.util.Random(42)
    val original = (0 until 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = original.substring(0, 200) + "XYZ" + original.substring(200)
    def chunks(t: String): Seq[String] =
      graft.queries.TextOps.cdcChunks(Seq(("d", t)).toDF("doc_id", "text"),
          Seq("doc_id")).select("c").collect().map(_.getString(0)).toSeq
    val a = chunks(original)
    val b = chunks(edited)
    assert(a.size >= 20, s"expected many chunks, got ${a.size}")
    // every chunk strictly after the edited one re-aligns bit-exactly —
    // the property fixed-offset chunking cannot have (one insert shifts
    // every later window)
    val common = a.toSet & b.toSet
    assert(common.size >= a.size - 3,
      s"only ${common.size}/${a.size} chunks survived a 3-char insert")
    assert(a.last == b.last, "tail chunks must re-align after the edit")
  }
}
