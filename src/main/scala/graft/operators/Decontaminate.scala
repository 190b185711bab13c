package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share any
  * word n-gram with a held-out evaluation set (the GPT-3 appendix-C /
  * PaLM-style overlap check, scaled down to n=5 for short synthetic
  * docs). Contaminated training documents silently inflate benchmark
  * scores, so a training-data engine must be able to sweep the corpus
  * against eval sets as a first-class operation.
  *
  * Scale design:
  *   - n-grams are built per-row with the slice+zip_with form (O(tokens)
  *     per evaluation even when the optimizer duplicates the expression —
  *     see `MinHashDedup.shingleSets` for why per-element `element_at`
  *     lambdas are a trap) and deduped per-row with `array_distinct`
  *     before exploding, so the shuffle carries distinct grams only;
  *   - grams travel as [[PortableHash.hex60]] longs (8 bytes), not gram
  *     strings (~30 bytes), cutting contamination-join shuffle bytes ~4×
  *     at a 2⁻⁶⁰ per-pair collision risk — and making the join replayable
  *     in the DuckDB oracle;
  *   - the overlap itself is a hash equi-join on the gram hash: cost
  *     tracks |corpus grams| + |eval grams| + |collisions|, never the
  *     corpus×eval document cross product. Eval sets are small relative
  *     to a 100 TB corpus, so the eval side broadcasts and the join
  *     itself is map-side; only the MATCHED rows (the contamination
  *     report's inputs — small by assumption) shuffle afterwards, into
  *     the per-document distinct-count aggregate (whose two DISTINCTs
  *     plan as an Expand doubling that matched subset).
  */
object Decontaminate {

  /** Array of the distinct word `n`-grams of a text column; documents
    * shorter than `n` tokens contribute their whole text as one gram
    * (mirrors `MinHashDedup.shingleSets` so short docs are never
    * silently exempt from the sweep). */
  def wordNgrams(textCol: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ws = split(textCol, " ")
    array_distinct(when(size(ws) - (n - 1) >= 1, slidingGrams(ws, n))
      .otherwise(array(textCol)))
  }

  /** The raw sliding word-gram array over a pre-split token array —
    * position i holds tokens [i, i+n). THE one copy of the gram-build
    * arithmetic ([[wordNgrams]], [[SpanDedup.posGramHashes]], and the
    * d49 top-gram rollup all wrap it): n parallel shifted slices folded
    * pairwise, O(n·tokens) per full evaluation regardless of how many
    * times the optimizer inlines the expression. Documents shorter than
    * n tokens yield an EMPTY array (callers choose their own short-doc
    * contract). */
  def slidingGrams(ws: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val cnt = size(ws) - (n - 1)
    val grams = (1 to n).map(i => slice(ws, lit(i), cnt))
      .reduce((acc, next) => zip_with(acc, next, (a, b) => concat_ws(" ", a, b)))
    when(cnt >= 1, grams).otherwise(array().cast("array<string>"))
  }

  /** (id, gram_hash) — exploded distinct n-gram hashes per document. */
  def gramHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.SketchFunctions.hex60Array(
        wordNgrams(col(textCol), n))).as("gh"))

  /** Per-training-document contamination report: every `corpus` document
    * sharing at least one word `n`-gram with any `evalSet` document,
    * with the count of distinct shared grams and of distinct eval
    * documents hit. Clean documents are absent (the common case — the
    * report is the drop list, not a corpus annotation).
    *
    * Output: (id, n_shared, n_eval_docs).
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame,
                    idCol: String, textCol: String, n: Int = 5): DataFrame = {
    // register in BOTH inputs' sessions: under foreachBatch the corpus
    // batch lives in a CLONED session with its own function registry,
    // while the static eval side is analyzed against the outer session's
    graft.functions.SketchFunctions.register(corpus.sparkSession)
    graft.functions.SketchFunctions.register(evalSet.sparkSession)
    val corpusGrams = gramHashes(corpus, idCol, textCol, n)
    // eval sets are tiny next to the corpus: broadcast them so the
    // corpus side joins map-side with zero shuffle
    val evalGrams = broadcast(
      gramHashes(evalSet, idCol, textCol, n)
        .select(col("id").as("eval_id"), col("gh")))
    corpusGrams
      .join(evalGrams, "gh")
      .groupBy(col("id"))
      .agg(countDistinct(col("gh")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
}
