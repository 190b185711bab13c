package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 60-bit SimHash near-duplicate detection (north-star extension, SURVEY
  * §7.2 phase 8). Each document's distinct tokens vote per bit (+1 if the
  * token hash has the bit set, −1 otherwise); the fingerprint keeps the
  * sign. Near-duplicates are fingerprint pairs within a small Hamming
  * distance.
  *
  * Scale design: the fingerprint is a row-local codegen'd fold — ZERO
  * shuffles — and pairing blocks on `NumBands` disjoint 12-bit bands of
  * the fingerprint (multi-permutation blocking): a pair is a candidate iff
  * it agrees exactly on at least one band, found by a plain equi-join on
  * (band index, band value). By pigeonhole, a pair within Hamming distance
  * `NumBands - 1` (= 4) differs in fewer bits than there are bands, so at
  * least one band is clean — recall is exactly 1.0 for maxHamming ≤ 4, not
  * probabilistic. Banding multiplies only the (tiny) fingerprint table by
  * `NumBands`, never the corpus, and the Hamming filter
  * (`bit_count(a XOR b)`) runs only inside band buckets.
  */
object SimHash {

  val Bits = 60
  val BandBits = 12
  /** 5 disjoint bands of 12 bits → guaranteed recall for Hamming ≤ 4. */
  val NumBands: Int = Bits / BandBits

  /** (id, simhash) — one 60-bit fingerprint per document, ZERO
    * shuffles: the bit-vote fold runs as a row-local codegen'd
    * expression (`graft.functions.SimHash60`) over the per-document
    * distinct-token hash array, instead of exploding tokens into a
    * 60-counter aggregate. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.SketchFunctions.register(docs.sparkSession)
    docs.repartition(col(idCol)).select(
      col(idCol).as("id"),
      graft.functions.SketchFunctions.simhash60(
        graft.functions.SketchFunctions.hex60Array(
          array_distinct(split(col(textCol), " ")))).as("simhash"))
  }

  /** Band `t` of a fingerprint: bits [Bits-BandBits·(t+1), Bits-BandBits·t). */
  def bandValue(simhash: Column, t: Int): Column =
    shiftright(simhash, Bits - BandBits * (t + 1))
      .bitwiseAND(lit((1L << BandBits) - 1))

  /** Pairs (id_a < id_b) sharing at least one of the `NumBands` bands,
    * with Hamming distance `<= maxHamming`. Exact (recall 1.0) for
    * `maxHamming <= NumBands - 1`; above that, pairs whose differing bits
    * hit every band can be missed. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int): DataFrame = {
    // persist the banded fingerprint table before self-joining: both join
    // sides would otherwise recompute the whole fingerprint chain (one
    // NumBands-row record per doc — cache cost is negligible next to it).
    // Lifecycle: the returned plan READS this cache lazily, so it cannot
    // be unpersisted here; callers that loop over corpora should
    // `spark.catalog.clearCache()` between runs (Bench/Verify do)
    val bands = fingerprints(docs, idCol, textCol)
      .select(col("id"), col("simhash"),
        explode(array((0 until NumBands).map(t =>
          struct(lit(t).as("t"), bandValue(col("simhash"), t).as("blk"))): _*)).as("band"))
      .select(col("id"), col("simhash"),
        col("band.t").as("t"), col("band.blk").as("blk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a pair can agree on several bands → distinct; hamming is a pure
    // function of the pair, so dedup after scoring stays correct
    bands.as("a").join(bands.as("b"),
        col("a.t") === col("b.t") && col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
