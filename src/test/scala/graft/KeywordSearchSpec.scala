package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KeywordSearch, Redact}

class KeywordSearchSpec extends AnyFunSuite {
  import SparkTestSession._

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "rare common common filler filler filler"),
      (2L, "common filler filler filler filler filler"),
      (3L, "common common filler filler filler filler"),
      (4L, "filler filler filler filler filler filler"),
      // long doc: same tf as doc 3 for "common" but twice the length
      (5L, "common common filler filler filler filler filler filler filler filler filler filler")
    ).toDF("doc_id", "text")
  }

  test("postings emits one row per (term, doc) with its tf") {
    val p = KeywordSearch.postings(corpus, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p(("rare", 1L)) == 1L)
    assert(p(("common", 3L)) == 2L)
    assert(p(("filler", 5L)) == 10L)
    assert(!p.contains(("rare", 2L)))
  }

  test("bm25: rare-term hit outscores common-term hit; tf and length normalization order docs") {
    val scores = KeywordSearch.bm25(corpus, "doc_id", "text", Seq("rare", "common"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1 holds the only "rare" posting (df=1, idf=(5-1+0.5)/1.5=3) plus a
    // "common" hit; it must dominate every common-only doc
    assert(scores(1L) > scores(3L), scores.toString)
    // tf effect: two "common" (doc 3) beats one (doc 2) at equal length
    assert(scores(3L) > scores(2L), scores.toString)
    // length normalization: same tf=2 but doc 5 is twice as long as doc 3
    assert(scores(3L) > scores(5L), scores.toString)
    // no query term -> score exactly 0
    assert(scores(4L) == 0.0, scores.toString)
  }

  test("bm25 matches a scalar reference implementation bit-for-bit") {
    val terms = Seq("rare", "common")
    val docs = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    val tokss = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = docs.length.toDouble
    val avgdl = tokss.map(_._2.size.toLong).sum.toDouble / n
    val dfs = terms.map(t => t -> tokss.count(_._2.contains(t)).toDouble).toMap
    val want = tokss.map { case (id, toks) =>
      val dl = toks.size.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf > 0) {
          val idf = (n - dfs(t) + 0.5) / (dfs(t) + 0.5)
          idf * ((tf * (KeywordSearch.K1 + 1.0)) /
            (tf + KeywordSearch.K1 * (1.0 - KeywordSearch.B + (KeywordSearch.B * dl) / avgdl)))
        } else 0.0
      }.reduce(_ + _)
      id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = KeywordSearch.bm25(corpus, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"got $got want $want")
  }

  test("bm25 plans as scan + one broadcast stats join: no shuffle exchange") {
    val plan = KeywordSearch.bm25(corpus, "doc_id", "text", Seq("rare"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("tfidfTopTerm picks each document's most distinctive term") {
    val top = KeywordSearch.tfidfTopTerm(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: "rare" df=1 dominates despite tf=1
    assert(top(1L) == "rare", top.toString)
    // doc 4 has only "filler" (df=5)
    assert(top(4L) == "filler", top.toString)
    // doc 5: tf 2/df 4 for common = 2.5; tf 10/df 5 filler = 10 -> filler
    assert(top(5L) == "filler", top.toString)
    // doc 3: common tf=2 df=4 -> 2.5 vs filler tf=4 df=5 -> 4.0
    assert(top(3L) == "filler", top.toString)
  }

  test("redact scrubs emails and phones, counts them, and is idempotent") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach a.b+c@mail.example.com or +1-555-0134 today"),
      (2L, "two mails x@y.io and z@w.co, no phone"),
      (3L, "clean text with spark @ mentions but no address"),
      (4L, "+1-555-0000 +1-555-1234")
    ).toDF("doc_id", "text")
    val out = Redact.redactDocs(df, "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(2), r.getInt(3), r.getString(1)))).toMap
    assert(out(1L) == ((1, 1, "reach [EMAIL] or [PHONE] today")), out.toString)
    assert(out(2L)._1 == 2 && out(2L)._2 == 0, out.toString)
    assert(out(2L)._3 == "two mails [EMAIL] and [EMAIL], no phone", out.toString)
    // bare '@' token is not a deliverable address -> untouched
    assert(out(3L) == ((0, 0, "clean text with spark @ mentions but no address")), out.toString)
    assert(out(4L) == ((0, 2, "[PHONE] [PHONE]")), out.toString)
    // idempotence: placeholders contain no pattern characters
    val again = Redact.redactDocs(
        df.select(col("doc_id"), Redact.redact(col("text")).as("text")), "text")
      .agg(sum("n_emails"), sum("n_phones")).collect()(0)
    assert(again.getLong(0) == 0 && again.getLong(1) == 0, again.toString)
  }

  test("redactDocs rejects inputs that already carry audit columns") {
    import spark.implicits._
    val df = Seq((1L, "x@y.io", 9)).toDF("doc_id", "text", "n_emails")
    val e = intercept[IllegalArgumentException](Redact.redactDocs(df, "text"))
    assert(e.getMessage.contains("n_emails"), e.getMessage)
  }

  test("bm25Ctes escapes single quotes in query terms") {
    val sql = KeywordSearch.bm25Ctes(Seq("it's"))
    assert(sql.contains("w = 'it''s'"), sql)
    assert(!sql.contains("= 'it's'"), sql)
  }
}
