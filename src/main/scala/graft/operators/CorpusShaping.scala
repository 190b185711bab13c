package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-shaping operators — the steps between a cleaned corpus and a
  * training run: stratified downsampling (data mixing) and fixed-window
  * token chunking (context packing).
  *
  * Both are pure row-local arithmetic — zero shuffles, reproducible
  * across runs, engines, and partitionings — because at 100 TB the
  * shaping pass runs as a map over the corpus scan and anything keyed on
  * run-time randomness (rand(), monotonically_increasing_id) would make
  * the dataset unrebuildable and splits unauditable.
  */
object CorpusShaping {

  /** Hash buckets for sampling rates: rates are exact multiples of 1e-4. */
  val RateBuckets = 10000L

  /** Deterministic stratified sampling by content hash — the corpus-mixing
    * primitive ("keep 30% of English, all of the rest"): a row survives
    * iff `hex60(text) mod 10000 < rate(stratum) * 10000`.
    *
    * Content-keyed (like the d9 hash split) so exact duplicates sample
    * identically and the decision is a pure function of the row —
    * re-running the pipeline, re-partitioning, or re-ingesting the corpus
    * reproduces the same sample. Unknown strata fall back to
    * `defaultRate`. The rate lookup compiles to a literal when-chain
    * (codegen'd, no join, no broadcast).
    */
  def stratifiedByHash(df: DataFrame, stratumCol: String, textCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    val bucket = pmod(PortableHash.hex60(col(textCol)), lit(RateBuckets))
    val threshold = rates.foldLeft(lit((defaultRate * RateBuckets).toLong): Column) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit((rate * RateBuckets).toLong))
          .otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Fixed-window token chunking — split each document's token sequence
    * into consecutive `chunkTokens`-token windows (final partial window
    * kept), one output row per chunk: (idCol, chunk_id, n_tokens,
    * chunk_md5). The chunk carries an md5 of its re-joined text (cheap,
    * engine-portable identity) rather than the text itself so the
    * operator can feed dedup/packing stats without re-shipping the corpus.
    *
    * Per-row cost is O(tokens): the token array is materialized ONCE in
    * its own projection (referenced twice, so CollapseProject keeps the
    * split out of the per-chunk lambda — see MinHashDedup.shingleSets for
    * the inlining trap this avoids) and each chunk slices it. */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    val C = chunkTokens
    val base = docs.select(col(idCol),
        split(col(textCol), " ").as("ws"))
      .select(col(idCol), col("ws"), size(col("ws")).as("nt"))
    base.select(col(idCol), col("nt"),
        posexplode(expr(
          s"transform(sequence(0, (size(ws) - 1) div $C)," +
            s" i -> array_join(slice(ws, i * $C + 1, $C), ' '))")))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        least(lit(C), col("nt") - col("pos") * C).cast("int").as("n_tokens"),
        md5(col("col")).as("chunk_md5"))
  }
}
