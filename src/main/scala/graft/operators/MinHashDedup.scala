package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the 100 TB scale path
  * for document dedup (north-star extension, SURVEY §7.2 phase 8; the
  * exact n-gram Jaccard baseline it approximates is
  * `queries/TextOps.d6JaccardNearDup`).
  *
  * Pipeline: word 3-shingles → K minhash values → B bands of R rows →
  * band-signature bucket join → candidate pairs → exact Jaccard verify.
  *
  * Scale design:
  *   - the signature step is ONE hash-aggregate (K min() columns over the
  *     exploded shingles, partial-aggregated map-side) — no K-way row
  *     explosion and no per-hash shuffle;
  *   - the bucket join is an equi-join on (band, signature), so candidate
  *     generation is a hash join whose cost tracks the number of true
  *     collisions, never the O(n²) pair space;
  *   - the exact-Jaccard verify re-joins shingles only for candidate
  *     pairs (LSH output), keeping verification cost proportional to the
  *     candidate count.
  *
  * All hashes are [[PortableHash.hex60]] so the DuckDB oracle replays the
  * pipeline value-for-value.
  */
object MinHashDedup {

  // K=16 hashes in B=8 bands of R=2: candidate probability at Jaccard s
  // is 1-(1-s²)⁸ ≈ 0.90 at s=0.5 and 0.996 at s=0.7. R=2 admits more
  // false candidates than deeper bands, but the exact-Jaccard verify
  // step filters them, and verification cost tracks candidate count.
  val K = 16      // minhash functions
  val R = 2       // rows per band
  val B: Int = K / R

  /** (id, shingle) — distinct word 3-shingles; documents shorter than 3
    * tokens contribute their whole text as one shingle. */
  def shingles(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val grams = transform(
      sequence(lit(0), size(ws) - 3),
      i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3)))
    docs.select(
      col(idCol).as("id"),
      explode(when(size(ws) >= 3, grams).otherwise(array(col(textCol)))).as("shingle"))
      .distinct()
  }

  /** (id, mh0..mh{K-1}) — one row per document, single shuffle. */
  def signature(sh: DataFrame): DataFrame = {
    val mins = (0 until K).map { k =>
      min(PortableHash.hex60(concat(lit(s"$k:"), col("shingle")))).as(s"mh$k")
    }
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** (id, band, sig) — band signature = md5 of the comma-joined row
    * values, so bucket keys are fixed-width strings. */
  def bandSignatures(sigs: DataFrame): DataFrame = {
    val bands = (0 until B).map { b =>
      val cols = (b * R until (b + 1) * R).map(k => col(s"mh$k").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("sig"))
    }
    sigs.select(col("id"), explode(array(bands: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Distinct candidate pairs (id_a < id_b) sharing any band bucket. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bs = bandSignatures(signature(shingles(docs, idCol, textCol)))
    bs.as("a").join(bs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Candidate pairs with exact shingle-set Jaccard attached, filtered to
    * `>= threshold`. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val pairs = candidatePairs(docs, idCol, textCol)
    val inter = pairs
      .join(sh.as("sa"), col("id_a") === col("sa.id"))
      .join(sh.as("sb"), col("id_b") === col("sb.id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("za"), col("id_a") === col("za.id"))
      .join(sizes.as("zb"), col("id_b") === col("zb.id"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
