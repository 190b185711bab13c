package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring SPAN dedup — the full Lee et al. 2022 operator
  * ("Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): per document, the maximal token RANGES covered by
  * any substring of at least `minLen` words that also appears verbatim
  * in another document. `Decontaminate`-based rows (d25/d46) count how
  * many distinct duplicated grams a document holds; this operator says
  * WHERE the copied text sits and HOW MUCH of the document it covers —
  * the per-doc copied-byte-range report the ExactSubstr pass of a
  * production dedup emits, and the signal a funnel stage thresholds on.
  *
  * Identity it rides on: a position p of document d lies inside a
  * cross-document shared substring of length ≥ L iff some L-gram of d
  * starting in [p−L+1, p] appears in another document — so the covered
  * set is exactly the union of the fixed-length intervals [j, j+L−1]
  * over duplicated L-gram start positions j, and "span extension"
  * reduces to interval merging (ends are monotone in starts at fixed
  * length, so a new span opens precisely when a start clears the
  * previous start by more than L — a gap of exactly L makes the two
  * intervals ADJACENT, leaving no uncovered hole, and adjacent covered
  * runs are one span).
  *
  * Scale shape (never all-pairs, never a suffix array over the corpus):
  *   - gram OCCURRENCES (id, pos, gh) are built per-row with the
  *     slice+zip_with form (O(L·tokens) even when the optimizer inlines
  *     the expression twice) and travel as hex60 longs;
  *   - duplicated-gram detection is ONE shuffle keyed on the gram hash
  *     (per-key rows bounded by the gram's occurrence count), the same
  *     inverted-gram posting list d46 builds — plus a semi-join back;
  *   - interval merging is a per-document window (partitioned by doc
  *     id — bounded by a document's own length, never a global sort)
  *     followed by per-span and per-doc aggregates.
  *
  * Deviations from the paper, both deliberate: granularity is word
  * grams, not bytes (the corpus convention every gram operator here
  * shares), and duplication is CROSS-document only (d46's rule) —
  * within-doc repetition is d49's Gopher scorecard; documents shorter
  * than `minLen` tokens report zero coverage (a short exact duplicate
  * is d1's catch, not a substring span).
  */
object SpanDedup {

  /** One row per word `n`-gram OCCURRENCE: (id, pos, gh) with `pos` the
    * 0-based start token index. NOT deduped per-row (unlike
    * [[Decontaminate.gramHashes]]) — positions are the point. */
  def posGramHashes(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    graft.functions.SketchFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
      posexplode(graft.functions.SketchFunctions.hex60Array(
        Decontaminate.slidingGrams(split(col(textCol), " "), n)))
        .as(Seq("pos", "gh")))
  }

  /** Per-document copied-span profile: (doc_id, n_tokens, n_spans,
    * covered_tokens, longest_span, copied_ppm), every document present
    * (zero coverage reports zeros). `minLen` is the minimum shared
    * substring length in words — the paper's L.
    *
    * Cache contract (the MinHashDedup/SimHash convention): the
    * positional gram table stays persisted so the df-filter and the
    * semi-join share one derivation — the CALLER releases it
    * (`spark.catalog.clearCache()`, as Verify/Bench do per query);
    * invoking this in a loop without releasing accumulates one cached
    * gram table per call. */
  def spanProfile(docs: DataFrame, idCol: String, textCol: String,
                  minLen: Int): DataFrame = {
    val grams = posGramHashes(docs, idCol, textCol, minLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // materialize ONCE: df-filter and semi-join both read it
    // "gram appears in ≥ 2 DISTINCT docs" as min(id) ≠ max(id): the
    // countDistinct form planned an Expand + two-phase distinct
    // aggregate just to answer an existence test; min/max is a plain
    // partially-aggregated groupBy (identical gram set — a gram whose
    // occurrences all share one id has min = max, any second id breaks
    // it; the oracle keeps the COUNT(DISTINCT) spelling)
    val dup = grams.groupBy(col("gh"))
      .agg(min(col("id")).as("i0"), max(col("id")).as("i1"))
      .filter(col("i0") =!= col("i1"))
      .select(col("gh"))
    val starts = grams.join(dup, Seq("gh"), "left_semi")
      .select(col("id"), col("pos"))
    val perDoc = mergedSpanLens(starts, minLen).groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("len")).as("covered_tokens"),
        max(col("len")).as("longest_span"))
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .join(perDoc, col("doc_id") === perDoc("id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"))
      .withColumn("copied_ppm",
        expr("(1000000 * covered_tokens) div n_tokens"))
  }

  /** Merge the fixed-length intervals [pos, pos+minLen−1] of a (id, pos)
    * start table into maximal covered runs: one (id, len) row per merged
    * span. Fixed-length intervals sorted by start have monotone ends, so
    * a span breaks exactly when the start gap exceeds L (at exactly L
    * the intervals are adjacent — no uncovered hole). Per-document
    * window only — bounded by a document's own length. Shared by
    * [[spanProfile]] (cross-doc spans) and the within-doc Gopher
    * repetition rules (d49). */
  private[graft] def mergedSpanLens(starts: DataFrame, minLen: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    starts
      .withColumn("ns",
        when(prev.isNull || col("pos") > prev + lit(minLen), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("sid"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("m"))
      .select(col("id"), (col("m") + lit(minLen) - col("s")).cast("long").as("len"))
  }
}
