package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 scalar quantization (SQ8) for embedding
  * columns — the storage-tier operator a vector corpus needs at scale: a
  * 64-dim float32 embedding (~256 B payload) compresses to 64 int8 codes
  * plus one double scale (~72 B), a ~3.5× footprint cut that multiplies
  * directly into scan throughput for brute-force ranking and IVF-list
  * probing (the classic SQ stage of FAISS-style indexes).
  *
  * Everything is per-row array arithmetic — codegen-friendly Catalyst
  * lambdas, zero shuffle: scale = max|x|/127, code_i = floor(x_i/scale +
  * 0.5) clamped to [-127, 127], dequant x̂_i = code_i·scale. The fixed
  * `floor(x + 0.5)` rounding form is deliberate: it reproduces exactly
  * across engines (the DuckDB oracle replays it bit-for-bit), unlike
  * library HALF_UP/HALF_EVEN roundings that differ between runtimes.
  * The max reconstruction error is scale/2 by construction (spec-pinned).
  */
object VectorQuant {

  /** Per-vector scale: max|x| / 127 (0.0 for the all-zero vector). */
  def sq8Scale(emb: Column): Column =
    array_max(transform(emb, x => abs(x))) / lit(127.0)

  /** int8 codes under `scale`; an all-zero vector quantizes to zeros
    * (guarding the 0/0 division). The clamp is a safety bound — by
    * construction |x|/scale <= 127, so only rounding at the extreme can
    * touch it. */
  def sq8Codes(emb: Column, scale: Column): Column =
    when(scale === 0.0, transform(emb, _ => lit(0)))
      .otherwise(transform(emb, x =>
        greatest(lit(-127), least(lit(127), floor(x / scale + lit(0.5)).cast("int")))))

  /** Dequantized approximation of the original vector. */
  def sq8Dequant(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)
}
