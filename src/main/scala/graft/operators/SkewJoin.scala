package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted fact-dim equi-join — the hot-key lever for JOINS, completing the
  * skew toolkit next to [[SkewAgg]] (the aggregate side of the same
  * problem). A shuffle join hashes every fact row for key `k` to ONE
  * reducer; a web-scale fact table with a power-law key (one user with 10%
  * of all events, one null-ish sentinel key, one viral document) stalls
  * the whole stage on that reducer. Salting spreads each key across
  * `salts` reducers: the fact side gets a deterministic per-row salt in
  * [0, salts), the dim side is replicated once per salt value, and the
  * join runs on (key, salt) — result rows are EXACTLY those of the plain
  * inner join (each fact row meets precisely the one dim copy carrying
  * its salt), so the oracle replays it as the unsalted join.
  *
  * Scale design:
  *   - the fact side is never replicated (it's the big side); the dim side
  *     grows `salts`× — the standard trade for fact-dim skew, chosen over
  *     AQE's skew-join splitting when the skew is known ahead of time or
  *     the join must behave deterministically without runtime re-planning;
  *   - the salt is a HASH of a caller-named distinguishing column
  *     ([[PortableHash.hex60]] of its string form — NULL-safe via a
  *     0 fallback, and type-agnostic where `pmod(id, n)` on a non-numeric
  *     id would silently yield NULL), so the salt is reproducible across
  *     runs and partitionings — no rand()/monotonic id;
  *   - the dim side carries a shuffle-hash hint: replicated dims stay
  *     modest, and a hash build avoids paying a sort on the `salts`×
  *     replica as sort-merge would.
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on `factKey = dimKey`, salted `salts` ways.
    * `saltBy` names a fact column whose values spread rows of a hot key
    * across salts (an event id, a line number — distribution matters,
    * uniqueness doesn't). Key columns must have distinct names (rename one
    * side first, as with any self-named join). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                      dimKey: String, saltBy: String, salts: Int = 16): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts (1 is a plain join)")
    require(factKey != dimKey,
      s"fact and dim key share the name '$factKey' — rename one side so the " +
        "join condition is unambiguous")
    // BOTH names on BOTH inputs: a dim-side `_salt` (or fact-side
    // `_dim_salt`) would otherwise surface later as an ambiguous-column
    // AnalysisException — or be silently dropped on the success path
    require(Seq("_salt", "_dim_salt").forall(c =>
        !fact.columns.contains(c) && !dim.columns.contains(c)),
      "input already carries a _salt/_dim_salt column — it would collide " +
        "with the join's internal salt (rename it first)")
    // NULL saltBy falls back to salt 0 rather than NULL: a NULL salt would
    // never equal the dim side's salt and the row would be silently dropped
    // even though its KEY matches — the salt must never change the result
    val fs = fact.withColumn("_salt",
      coalesce(pmod(PortableHash.hex60(col(saltBy).cast("string")),
        lit(salts.toLong)), lit(0L)))
    val ds = dim.withColumn("_dim_salt",
      explode(expr(s"sequence(0L, ${salts - 1}L)")))
    fs.join(ds.hint("shuffle_hash"),
        col(factKey) === col(dimKey) && col("_salt") === col("_dim_salt"))
      .drop("_salt", "_dim_salt")
  }

  /** ADAPTIVE salting: salt only `hotKeys` (the detected skew — feed
    * [[ApproxOps.heavyHitters]]' items in), join everything else plain.
    * The production composition of the skew toolkit: blanket salting
    * replicates the WHOLE dim `salts`× and forces every fact row through
    * the salt arithmetic even when one key in a million is hot; here the
    * dim replicates only for hot keys (cold dim rows ride once, salt 0),
    * cold fact rows take salt 0, and hot fact rows spread across
    * `salts` reducers — one fact scan, one dim pass, one (key, salt)
    * shuffle, and the result is row-for-row the plain inner join
    * (spec-pinned, and oracle-pinned by s3 against the unsalted SQL).
    *
    * `hotKeys` values must be of the join key's type; an empty list
    * degrades to the plain join (correct and cheapest). */
  def adaptiveSaltedInnerJoin(fact: DataFrame, dim: DataFrame,
                              factKey: String, dimKey: String, saltBy: String,
                              hotKeys: Seq[Any], salts: Int = 16): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts (1 is a plain join)")
    require(factKey != dimKey,
      s"fact and dim key share the name '$factKey' — rename one side so the " +
        "join condition is unambiguous")
    require(Seq("_salt", "_dim_salt").forall(c =>
        !fact.columns.contains(c) && !dim.columns.contains(c)),
      "input already carries a _salt/_dim_salt column — it would collide " +
        "with the join's internal salt (rename it first)")
    if (hotKeys.isEmpty)
      return fact.join(dim.hint("shuffle_hash"), col(factKey) === col(dimKey))
    val fs = fact.withColumn("_salt",
      when(col(factKey).isin(hotKeys: _*),
        coalesce(pmod(PortableHash.hex60(col(saltBy).cast("string")),
          lit(salts.toLong)), lit(0L)))
        .otherwise(lit(0L)))
    val ds = dim.withColumn("_dim_salt",
      explode(when(col(dimKey).isin(hotKeys: _*),
        expr(s"sequence(0L, ${salts - 1}L)")).otherwise(array(lit(0L)))))
    fs.join(ds.hint("shuffle_hash"),
        col(factKey) === col(dimKey) && col("_salt") === col("_dim_salt"))
      .drop("_salt", "_dim_salt")
  }
}
