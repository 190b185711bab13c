package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document corpus (north-star extension):
  * BPE-style token counting, polynomial rolling-hash fingerprints, and
  * character-trigram language identification. The SQL-expressible pieces
  * are oracle-checked via `queries.TextOps` (d7/d8); language ID is
  * profile-driven and spec-tested.
  */
object TextAnalysis {

  /** BPE-ish pre-tokenization pattern: letter runs, digit runs, single
    * non-space symbols — the GPT-2-style split shape restricted to
    * constructs that parse identically under Java regex and RE2 (the
    * engines the Spark side and the DuckDB oracle use). */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token count under [[BpeTokenPattern]] (vs naive whitespace count:
    * punctuation and digit runs count as their own tokens). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  // rolling-hash parameters: base 31, modulus 2^55 keeps acc*31+c inside
  // int64 (2^55·31 + 255 < 2^60) so the fold is exact in any engine
  val RollBase = 31L
  val RollMod: Long = 1L << 55

  /** Polynomial rolling hash of the whole text (Horner over character
    * codes): h = fold(chars, 0, (acc, c) => (acc·B + c) mod M). Unlike
    * md5 fingerprints this supports incremental/windowed updates — the
    * standard building block for content-defined chunking. */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, c) => (acc * RollBase + c) % RollMod)

  /** Tiny character-trigram profiles for the language-ID heuristic —
    * high-frequency trigrams (with word-boundary spaces) per language. */
  val TrigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "he ", " th", "ing", "and", " an", "ion", " of",
      "of ", "ed ", " in", "ent"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " el", "el ", "ión",
      "ent", " en", "es ", "ue "),
    "de" -> Seq("en ", "er ", " de", "der", "ie ", " di", "die", "sch",
      "ein", "ich", "nde", " un"))

  /** (id, pred_lang, score): language with the most profile-trigram hits
    * in the document's distinct trigram set; ties and zero-hit docs
    * resolve to "unknown". Trigrams via slice+zip_with (per-row O(n),
    * duplication-safe — same rationale as MinHashDedup.shingleSets). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = split(lower(col(textCol)), "")
    val n = size(chars)
    val grams = array_distinct(zip_with(
      zip_with(slice(chars, lit(1), n - 2), slice(chars, lit(2), n - 2), (a, b) => concat(a, b)),
      slice(chars, lit(3), n - 2),
      (ab, c) => concat(ab, c)))
    val scored = docs.select(col(idCol).as("id"), grams.as("grams"))
    val langScores = TrigramProfiles.toSeq.sortBy(_._1).map { case (lang, profile) =>
      struct(
        size(array_intersect(col("grams"), array(profile.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // max over (score, lang) structs = argmax; score ties break to the
    // lexically LARGEST language code (struct comparison falls through to
    // the second field), deterministic and spec-pinned
    scored.withColumn("best", greatest(langScores: _*))
      .select(
        col("id"),
        when(col("best.score") > 0, col("best.lang")).otherwise("unknown").as("pred_lang"),
        col("best.score").as("score"))
  }
}
