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

  /** (id, simhash) — one 60-bit fingerprint per document. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.repartition(col(idCol)).select(
      col(idCol).as("id"),
      explode(array_distinct(split(col(textCol), " "))).as("w"))
      .withColumn("h", PortableHash.hex60(col("w")))
    val votes = (0 until Bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$j")
    }
    val assembled: Column = (0 until Bits).map { j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), assembled.as("simhash"))
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
