package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** Shared engine-portability conventions for the oracle-checked queries —
  * ONE definition so the representation contract with the DuckDB oracle
  * cannot drift between query families.
  */
private[queries] object Conventions {

  val Dec: DecimalType = DecimalType(38, 4)

  /** Integer-grid accumulator type: Spark DECIMAL(38,0) sums/products are
    * exact where DuckDB transparently widens BIGINT to HUGEINT — the pair
    * that makes the "multiply everything out, divide once at the end"
    * oracle-exactness pattern (q29/e21/e23) hold on both engines. */
  val Dec38: DecimalType = DecimalType(38, 0)

  /** Exact decimal accumulation, double output: the interior SUM runs over
    * DECIMAL(38,4) (order-independent, engine-exact), and only the final
    * result is cast to DOUBLE. Identical decimals convert to identical
    * doubles (unscaled values stay < 2^53 at every tested SF, so the
    * decimal→double conversion is a single correctly-rounded IEEE division
    * in both Spark and DuckDB), and DOUBLE columns are representation-stable
    * under the driver's hasher where DECIMAL columns are not
    * (CORRECTNESS_r01: all 12 hash-fails were DECIMAL-typed outputs with
    * bit-identical values). The paired oracle SQL applies the same
    * `CAST(SUM(CAST(x AS DECIMAL(38,4))) AS DOUBLE)` shape. */
  def decSum(c: Column, name: String): Column =
    sum(c.cast(Dec)).cast("double").as(name)
}
