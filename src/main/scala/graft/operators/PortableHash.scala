package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 60-bit deterministic hash shared by the scale operators (MinHash,
  * SimHash, hyperplane LSH) and replayable in any engine with an `md5`
  * function: take the first 15 hex chars of md5 and read them as an
  * unsigned integer. 60 bits fits a signed 64-bit value, so the same
  * number is representable everywhere (no unsigned-overflow divergence),
  * and md5 is byte-stable across engines — the DuckDB oracle computes
  * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)` and gets identical
  * values.
  *
  * This replaces engine-private hashes (Spark's murmur3 `hash()`,
  * DuckDB's `hash()`) wherever a result must be oracle-checkable; the
  * cost is one md5 per input, which is still cheap relative to the
  * shuffle the hash feeds.
  */
object PortableHash {

  /** Column form: 60-bit hash of a string column. */
  def hex60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Driver-side twin of [[hex60]] for deriving constants (e.g. LSH
    * hyperplane weights) that must match the in-engine/oracle values. */
  def hex60(s: String): Long =
    hex60Bytes(s.getBytes(StandardCharsets.UTF_8))

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Hot-path form (called per element from `hex60_array`'s generated
    * code): first 15 hex chars of md5 = top 60 bits of the first 8
    * digest bytes, read arithmetically — no hex-string round-trip. */
  def hex60Bytes(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    // big-endian long of bytes 0..7, then drop the low nibble (16 hex
    // chars → first 15) and clear the sign: identical to parsing the
    // first 15 hex characters
    val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** Pseudo-random weight in [-1, 1] derived from a seed string —
    * deterministic, engine-independent (used for LSH hyperplanes). */
  def weight(seed: String): Double = (hex60(seed) % 2001L - 1000L) / 1000.0
}
