package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 60-bit SimHash near-duplicate detection (north-star extension, SURVEY
  * §7.2 phase 8). Each document's distinct tokens vote per bit (+1 if the
  * token hash has the bit set, −1 otherwise); the fingerprint keeps the
  * sign. Near-duplicates are fingerprint pairs within a small Hamming
  * distance.
  *
  * Scale design: the fingerprint is ONE hash-aggregate over exploded
  * tokens — 60 `sum` columns with map-side partial aggregation, so the
  * shuffle carries one 60-counter row per document, not per token.
  * Pairing blocks on the high 12 bits of the fingerprint (equi-join), so
  * pair generation is a hash join; the Hamming filter
  * (`bit_count(a XOR b)`) runs only inside blocks. One-block SimHash can
  * miss pairs whose differing bits fall in the block — the standard
  * multi-permutation extension is T rotated copies of the table, which
  * multiplies only the (tiny) fingerprint table, not the corpus.
  */
object SimHash {

  val Bits = 60
  val BlockShift = 48 // block key = top 12 bits

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

  /** Pairs (id_a < id_b) in the same high-bit block with Hamming distance
    * `<= maxHamming`. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
    fp.as("a").join(fp.as("b"),
        shiftright(col("a.simhash"), BlockShift) === shiftright(col("b.simhash"), BlockShift) &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
