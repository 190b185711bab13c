package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional data-skipping
  * lever for tables queried on more than one column. Partitioning or
  * sorting on a single column makes parquet min/max stats tight on THAT
  * column only; interleaving the bits of two dimension keys into one
  * z-address and range-sorting the write on it clusters rows into
  * rectangles of the 2-D key space, so per-file (and per-row-group) min/max
  * ranges are narrow on BOTH columns and a conjunctive filter prunes most
  * of the table at scan time (the OPTIMIZE ZORDER operation of lakehouse
  * table formats, expressed as a plain Spark write).
  *
  * The z-address is pure integer bit arithmetic — shift/mask/or — and
  * therefore engine-portable: the DuckDB oracle replays it bit-for-bit
  * (see [[zAddressSql]]).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of `a` (even positions) and
    * `b` (odd positions): z = Σᵢ ((a>>i)&1)<<2i | ((b>>i)&1)<<(2i+1).
    * Unrolled at plan-build time into a codegen-friendly OR chain of
    * shift/mask terms — no UDF, no loop at runtime. Callers quantize
    * dimensions to non-negative ints first (e.g. `floor`, rank buckets,
    * or `& mask`); 16 bits per dimension is plenty for file-level
    * clustering (65k cells per dim). */
  def zAddress(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB replay of [[zAddress]] over column expressions `a`/`b` —
    * the same unrolled shift/mask/or chain, same operand order. */
  def zAddressSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Writes `df` as parquet z-ordered on the quantized dimension pair:
    * range-repartition on the z-address into `files` output files, sort
    * within each partition by z, drop the helper column. Range + local
    * sort (not a global `orderBy`) keeps it a single shuffle whose
    * partitions write independently — the same cost as any repartitioned
    * write. Row-group min/max stats then make conjunctive filters on the
    * SOURCE columns prune at read time; no reader-side cooperation needed
    * beyond ordinary parquet footer filtering. */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, path: String,
      files: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zAddress(a, b, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
