package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-shaping operators — the steps between a cleaned corpus and a
  * training run: stratified downsampling (data mixing), fixed-window
  * token chunking (context packing), per-stratum cap sampling (class
  * balancing), and cross-document sequence packing.
  *
  * The sampling/chunking ops are pure row-local arithmetic — zero
  * shuffles, reproducible across runs, engines, and partitionings —
  * because at 100 TB the shaping pass runs as a map over the corpus scan
  * and anything keyed on run-time randomness (rand(),
  * monotonically_increasing_id) would make the dataset unrebuildable and
  * splits unauditable. The cap/pack ops need real shuffles (a cap is a
  * per-group statement, a pack a global prefix) and are built so no
  * single task ever holds more than a bounded slice.
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
    keepByBucket(df, stratumCol, textCol,
      rates.map { case (s, r) => s -> (r * RateBuckets).toLong },
      (defaultRate * RateBuckets).toLong)
  }

  /** Shared survival filter: row kept iff hex60(text) mod 10000 is below
    * its stratum's bucket threshold. Integer thresholds only — callers
    * that derive thresholds arithmetically ([[mixToTokenTargets]]) must
    * not round-trip them through doubles. */
  private def keepByBucket(df: DataFrame, stratumCol: String, textCol: String,
                           buckets: Map[String, Long],
                           defaultBucket: Long): DataFrame = {
    val bucket = pmod(PortableHash.hex60(col(textCol)), lit(RateBuckets))
    val threshold = buckets.foldLeft(lit(defaultBucket): Column) {
      case (acc, (stratum, b)) =>
        when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Corpus mixing to TARGET token shares — "give every language an equal
    * token budget", "mix code:web:books at 2:5:1" — rather than d15-style
    * hand-picked per-stratum rates. Downsampling only (no stratum is
    * upsampled): the achievable mix is limited by its scarcest stratum,
    * so the operator finds the largest total K with w_s·K tokens available
    * in every stratum s and keeps each stratum at rate (w_s·K)/tokens_s.
    *
    * ALL-INTEGER derivation (engine-exact, oracle-replayable — no
    * float rates anywhere):
    *   kmin      = min_s (tokens_s div w_s)   — tokens per weight unit
    *   bucket_s  = (w_s · kmin · 10000) div tokens_s   — in [0, 10000]
    * then the usual content-hash bucket filter. Per-stratum token totals
    * are a bounded driver collect (|strata| rows, like a centroid fetch);
    * the filter itself is row-local, zero shuffle. Strata without a
    * weight are dropped (bucket 0) — a mix definition is exhaustive.
    */
  def mixToTokenTargets(df: DataFrame, stratumCol: String, textCol: String,
                        weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mix weights must be positive")
    val totals = df
      .groupBy(col(stratumCol))
      .agg(sum((length(col(textCol)) -
        length(expr(s"replace($textCol, ' ', '')")) + 1).cast("long")).as("t"))
      .collect()
      // a stratum whose texts are all NULL sums to NULL — no tokens to
      // mix, treat as absent rather than NPE on the driver
      .collect { case r if !r.isNullAt(1) && r.getLong(1) > 0 =>
        r.getString(0) -> r.getLong(1) }.toMap
    val present = weights.filter { case (s, _) => totals.contains(s) }
    require(present.nonEmpty, "no weighted stratum present in the data")
    val kmin = present.map { case (s, w) => totals(s) / w }.min
    require(kmin > 0,
      "mix weights are too skewed for the data: the scarcest weighted " +
        "stratum holds fewer tokens than its weight, so every derived " +
        "rate floors to zero — rescale the weights or drop the stratum")
    val buckets = present.map { case (s, w) =>
      require(w * kmin <= Long.MaxValue / RateBuckets,
        s"token scale overflows the integer rate derivation for stratum $s")
      val b = (w * kmin * RateBuckets) / totals(s)
      require(b > 0,
        s"stratum $s is more than ${RateBuckets}x over its weighted share " +
          "— its sampling rate floors below the 1e-4 bucket resolution and " +
          "the stratum would be silently dropped; raise its weight or " +
          "pre-split the corpus")
      s -> b
    }
    keepByBucket(df, stratumCol, textCol, buckets, defaultBucket = 0L)
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

  /** Salt width for [[capPerStratum]]'s pre-cap phase. */
  private val CapSalts = 16

  /** Deterministic per-stratum cap — keep at most `k` documents per
    * stratum (class balancing / majority-class downsampling), picked by
    * content-hash order so the selection is a reproducible pseudo-random
    * sample (same rationale as [[stratifiedByHash]]) with doc id as the
    * total-order tiebreak.
    *
    * Two-phase for skew (the q9 salted top-k shape): phase 1 caps within
    * (stratum, salt-of-id) — each window partition sorts ≤ 1/16 of a
    * stratum and emits ≤ k rows; phase 2 re-caps the ≤ 16k survivors per
    * stratum. The global top-k by (hash, id) per stratum is exactly the
    * top-k of the union of per-salt top-ks, so the result is identical to
    * the single-window form while no task ever sorts a whole hot stratum.
    */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                    textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"cap must be >= 1, got $k")
    require(!df.columns.contains("_rk"),
      "input already has a _rk column — it would be silently consumed by " +
        "the cap's internal rank (rename it first)")
    val order = Seq(PortableHash.hex60(col(textCol)), col(idCol))
    // salt by a hash of the id's STRING form, not pmod(id, 16): pmod on a
    // non-numeric id yields NULL, which would silently collapse every
    // stratum into one unsalted window partition — the result would still
    // be correct (phase 2 re-caps globally) but the "no task sorts a whole
    // hot stratum" guarantee would vanish without any error
    val pre = Window.partitionBy(col(stratumCol),
        pmod(PortableHash.hex60(col(idCol).cast("string")),
          lit(CapSalts.toLong))).orderBy(order: _*)
    val fin = Window.partitionBy(col(stratumCol)).orderBy(order: _*)
    df.withColumn("_rk", row_number().over(pre)).filter(col("_rk") <= k)
      .withColumn("_rk", row_number().over(fin)).filter(col("_rk") <= k)
      .drop("_rk")
  }

  /** Cross-document sequence packing — the "concatenate and chunk"
    * assignment LLM pre-training uses: documents are laid end-to-end in
    * ascending id order and cut into `budget`-token packs; each document
    * is labeled with the pack its first token lands in. Output:
    * (id, n_tokens, pack_id).
    *
    * A pack label is a GLOBAL prefix sum, which a naive window
    * (`Window.orderBy(id)` with no partition) would compute on a single
    * task. This runs it as the classic two-phase distributed prefix sum:
    *   1. ids are binned into `nParts` contiguous ranges by pure
    *      arithmetic on the (min, max) id span — no sampling, so the
    *      binning is deterministic and needs no pinned materialization;
    *   2. per-bin token totals (≤ nParts rows — bounded, like a
    *      centroid collect) come to the driver and become each bin's
    *      exclusive offset, re-joined by a broadcast;
    *   3. a within-bin cumulative sum (one window shuffle on the bin id,
    *      per-bin sort spills) plus the offset is the global prefix.
    * The result is independent of nParts (offsets absorb the bin
    * boundaries), which the spec pins. Integer arithmetic throughout —
    * engine-exact, DuckDB replays it as one window cumsum.
    *
    * The input frame must be DETERMINISTIC (a table/scan or pure
    * transforms of one): per-bin offsets are collected in one job and the
    * labeled output computed in another, so a nondeterministic input
    * (sample(), limit() over unordered data) could present different rows
    * to the two passes. `idCol` must also be UNIQUE: the within-bin
    * cumulative sum orders by id with a ROWS frame, so duplicate ids make
    * the running sum's tie order undefined and the pack labels can
    * diverge from the oracle's single-window cumsum. No cache is left
    * behind.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, nParts: Int = 0): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    val parts = if (nParts > 0) nParts
      else spark.sessionState.conf.numShufflePartitions
    val toks = docs.select(col(idCol).as("id"),
        (length(col(textCol)) - length(expr(s"replace($textCol, ' ', '')"))
          + 1).cast("long").as("nt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val span = toks.agg(min(col("id")).as("lo"), max(col("id")).as("hi"),
      count(lit(1)).as("n")).head
    if (span.getLong(2) == 0L) {
      toks.unpersist()
      return toks.select(col("id"), col("nt"), lit(0L).as("pack_id")).limit(0)
    }
    val lo = span.getLong(0)
    val width = math.max(1L, (span.getLong(1) - lo) / parts + 1L)
    // `div` (integer division) rather than `/`: the latter is a DOUBLE
    // divide, which silently loses exactness once operands pass 2^53 —
    // a realistic corpus-wide token count
    val binned = toks.withColumn("bin", expr(s"(id - ${lo}L) div ${width}L"))
    val binTotals = binned.groupBy(col("bin")).agg(sum(col("nt")).as("btot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // the persist existed to serve the two bounded aggregates above; the
    // final plan recomputes the row-local token projection from the scan
    // (bin assignment is pure arithmetic of id, so the re-read is
    // bit-identical) — releasing here means callers hold no cache
    toks.unpersist()
    val offsets = binTotals.map(_._1).zip(
      binTotals.map(_._2).scanLeft(0L)(_ + _))
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("bin", "offset")
    val w = Window.partitionBy(col("bin")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.join(broadcast(offsetDf), Seq("bin"))
      .withColumn("cum", sum(col("nt")).over(w) + col("offset"))
      .select(col("id"), col("nt"),
        expr(s"(cum - nt) div ${budget}L").as("pack_id"))
  }

  /** Deterministic EPOCH CURRICULUM — the step between "corpus built"
    * and "corpus consumable": a reproducible training order per epoch
    * that (a) SHUFFLES within each stratum by a seeded content-free
    * hash (hex60 of "epoch:id" — re-runs, re-partitionings, and both
    * engines agree bit-for-bit), and (b) INTERLEAVES the strata evenly
    * (stratum s's r-th document sorts at fractional key (2r+1)/(2·nₛ),
    * so any prefix of the stream holds each stratum in proportion — the
    * data-mixing property a curriculum exists for; a plain global
    * shuffle only achieves it in expectation, this achieves it by
    * construction). Epochs differ (the hash is epoch-seeded) but each
    * is the same multiset — one pass per epoch over the corpus, zero
    * randomness.
    *
    * Output: (epoch, position, id, stratum), position dense 0..N−1 per
    * epoch.
    *
    * Scale shape: NO global or per-stratum window anywhere — both the
    * within-stratum rank and the global position are two-phase
    * distributed prefix counts (the [[packSequences]] posture): bin on
    * the hash/key range, collect per-bin COUNTS (bounded by
    * epochs × |strata| × partitions — never data), then per-bin
    * row_number + broadcast offsets. The fractional key is ONE integer
    * division in doubles ((2r+1)/(2nₛ), both operands ≪ 2⁵³ for any
    * real corpus), so the IEEE result — and therefore the order — is
    * engine-portable. `stratumCol` is compared as a string (strata are
    * labels). */
  def curriculumInterleave(docs: DataFrame, idCol: String,
      stratumCol: String, epochs: Int, nParts: Int = 0): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val parts = if (nParts > 0) nParts
      else spark.sessionState.conf.numShufflePartitions
    val base = docs.select(col(idCol).as("id"),
      col(stratumCol).cast("string").as("stratum"))
    val ep = (0 until epochs).map(e => base.withColumn("epoch", lit(e.toLong)))
      .reduce(_ unionByName _)
    val hashed = ep.withColumn("h", PortableHash.hex60(
      concat(col("epoch").cast("string"), lit(":"), col("id").cast("string"))))
    // phase A — within-stratum rank: bin the 60-bit hash space
    val hWidth = (1L << 60) / parts + 1L
    val binned = hashed.withColumn("hbin", expr(s"h div ${hWidth}L"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val aCounts = binned.groupBy(col("epoch"), col("stratum"), col("hbin"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val offRows = aCounts.groupBy(r => (r._1, r._2)).toSeq.flatMap {
      case ((e, s), rows) =>
        val sorted = rows.sortBy(_._3)
        val ns = sorted.map(_._4).sum
        sorted.map(_._3).zip(sorted.map(_._4).scanLeft(0L)(_ + _))
          .map { case (bin, off) => (e, s, bin, off, ns) }
    }
    val offDf = offRows.toDF("epoch", "stratum", "hbin", "off", "ns")
    val wH = Window.partitionBy(col("epoch"), col("stratum"), col("hbin"))
      .orderBy(col("h"), col("id"))
    val keyed = binned.join(broadcast(offDf), Seq("epoch", "stratum", "hbin"))
      .withColumn("r", row_number().over(wH).cast("long") - 1L + col("off"))
      .withColumn("key",
        expr("CAST(2 * r + 1 AS DOUBLE) / CAST(2 * ns AS DOUBLE)"))
      .withColumn("kbin", floor(col("key") * lit(parts.toDouble)).cast("long"))
    // phase B — global position per epoch: bin the key range (key ∈
    // (0,1); floor(key·parts) is monotone in key, so cross-bin order is
    // the global (key, stratum, id) order)
    val bCounts = keyed.groupBy(col("epoch"), col("kbin"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val off2Rows = bCounts.groupBy(_._1).toSeq.flatMap { case (e, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (bin, off) => (e, bin, off) }
    }
    val off2Df = off2Rows.toDF("epoch", "kbin", "off2")
    val wK = Window.partitionBy(col("epoch"), col("kbin"))
      .orderBy(col("key"), col("stratum"), col("id"))
    // release the phase-A cache: the final plan recomputes the row-local
    // hash/bin projection from the scan (deterministic), the
    // packSequences discipline — callers hold no cache
    binned.unpersist()
    keyed.join(broadcast(off2Df), Seq("epoch", "kbin"))
      .withColumn("position",
        row_number().over(wK).cast("long") - 1L + col("off2"))
      .select(col("epoch"), col("position"), col("id"), col("stratum"))
  }
}
