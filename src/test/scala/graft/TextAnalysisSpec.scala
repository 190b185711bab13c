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
