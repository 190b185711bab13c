package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — diversified top-k retrieval: instead of the k nearest
  * neighbors (which for a near-dup-ridden corpus are k copies of the same
  * passage), greedily pick the candidate maximizing
  * `λ·rel(q, d) − (1−λ)·max_{s∈S} sim(d, s)` — relevance discounted by
  * similarity to what's already selected. The retrieval-time complement
  * of the dedup operators: dedup cleans the corpus once, MMR diversifies
  * each result list.
  *
  * Scale split: pool extraction is distributed (broadcast query batch
  * against the full corpus, exactly the v1/a1/i1 shape — swap in the
  * LSH/IVF variants for a 100 TB corpus), pairwise pool similarity is
  * distributed (|q|·pool² rows, bounded by construction), and the greedy
  * selection runs ON EXECUTORS as a `flatMapGroups` per q_id over the
  * pooled candidates — queries are independent, each group is a bounded
  * pool² of integers, and the driver never touches the data path, so a
  * large query batch scales out with the cluster.
  *
  * Exactness: λ is a RATIONAL (num/den) and the greedy recurrence runs in
  * integers — cosines land on the 6dp grid (the repo's rounding
  * convention), are lifted to exact micro-units (`round(cos·10⁶)` — the
  * double is within 1e-10 of the grid point, so the lift recovers the
  * integer identically in any engine), and the score is
  * `num·rel_ppm − (den−num)·max_sim_ppm`: pure 64-bit arithmetic with no
  * FP boundary cases, replayed step-by-step by the DuckDB oracle. The
  * e14 funnel's basis-point trick, applied to a selection loop.
  */
object MmrRerank {

  /** Diversified top-k for each query vector: (q_id, rk, neighbor,
    * mmr_e7) where mmr_e7 is the integer score in 10⁻⁷ units of
    * λ-weighted cosine (λ = lambdaNum/lambdaDen). Candidates never
    * include the query row itself; ties break on candidate id. Persists
    * the bounded candidate pool (released by the caller's clearCache,
    * like every query-held cache). */
  def diversifiedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                      vecCol: String, poolSize: Int, k: Int,
                      lambdaNum: Int = 7, lambdaDen: Int = 10): DataFrame = {
    val (pool, sims) = poolAndSims(queries, corpus, idCol, vecCol,
      poolSize, k, lambdaNum, lambdaDen)
    selectFrom(pool, sims, k, lambdaNum, lambdaDen)
  }

  /** MMR over a CALLER-SUPPLIED candidate pool — the serving-stack
    * composition: an upstream retrieval/fusion stage decides WHAT is
    * relevant (`relppm` already on an integer grid — hybrid RRF ranks,
    * a keyword score, anything total-ordered), and this diversifies it.
    * `pool` carries (q_id, nid, relppm, emb); zero-norm embeddings are
    * excluded up front (no cosine — the [[poolAndSims]] rule). Pairwise
    * pool similarity and the greedy recurrence are exactly
    * [[diversifiedTopK]]'s, so the oracle text is shared too
    * ([[greedySelSql]]). */
  def diversifiedFromPool(pool: DataFrame, k: Int,
                          lambdaNum: Int = 7, lambdaDen: Int = 10): DataFrame = {
    require(lambdaNum > 0 && lambdaNum <= lambdaDen,
      s"need 0 < lambdaNum <= lambdaDen, got $lambdaNum/$lambdaDen")
    val spark = pool.sparkSession
    graft.functions.DotProduct.register(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dotProduct(a, b)
    val p = pool.select(col("q_id"), col("nid"), col("relppm"), col("emb"))
      .filter(dot(col("emb"), col("emb")) > 0.0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    // eager pin of the (<= |q|·k row) result, then release the pool —
    // a long-lived serving session calling this per request must not
    // accumulate cache entries (diversifiedTopK's pool release is the
    // caller's clearCache by documented contract; this entry point owns
    // its own pool, so it cleans up itself)
    val out = selectFrom(p, pairwiseSims(p), k, lambdaNum, lambdaDen)
      .localCheckpoint()
    p.unpersist()
    out
  }

  /** The pairwise pool-similarity lift both entry points share: the
    * round-6 cosine of every same-query candidate pair in exact
    * micro-units — the integer-exactness contract every MMR oracle
    * replays, kept in ONE place so the two paths cannot drift. */
  private def pairwiseSims(pool: DataFrame): DataFrame = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dotProduct(a, b)
    val a = pool.select(col("q_id"), col("nid").as("id_a"), col("emb").as("ea"))
    val b = pool.select(col("q_id"), col("nid").as("id_b"), col("emb").as("eb"))
    a.join(b, Seq("q_id"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("q_id"), col("id_a"), col("id_b"),
        round(round(dot(col("ea"), col("eb")) /
          (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb")))), 6)
          * 1e6).cast("long").as("simppm"))
  }

  /** The selection stage shared by both entry points: one shuffle on
    * q_id gathers a query's relevances (is_sim = false) and pairwise
    * similarities (is_sim = true) into one group; the greedy recurrence
    * then runs where the group lives. A group is pool + pool² integer
    * rows — bounded by construction. */
  private def selectFrom(pool: DataFrame, sims: DataFrame, k: Int,
                         lambdaNum: Int, lambdaDen: Int): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    val tagged = pool
      .select(col("q_id"), col("nid").as("a"), lit(-1L).as("b"),
        col("relppm").as("v"), lit(false).as("is_sim"))
      .unionByName(sims.select(col("q_id"), col("id_a").as("a"),
        col("id_b").as("b"), col("simppm").as("v"), lit(true).as("is_sim")))
      .as[(Long, Long, Long, Long, Boolean)]
    tagged.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rows = it.toSeq
      val rels = rows.collect { case (_, a, _, v, false) => a -> v }.toMap
      val simMap = rows.collect { case (_, a, b, v, true) => (a, b) -> v }.toMap
      greedy(qid, rels, simMap, k, lambdaNum, lambdaDen)
    }.toDF("q_id", "rk", "neighbor", "mmr_e7")
  }

  /** The greedy selection as SQL CTE text over `pool(q_id, nid,
    * relppm, …)` and `sims(q_id, id_a, id_b, simppm)` — `sel1..sel<k>`,
    * each holding that step's pick. Shared by every MMR oracle (v7, h8)
    * so the recurrence text cannot drift between rows. */
  private[graft] def greedySelSql(k: Int, lambdaNum: Int,
                                  lambdaDen: Int): String = {
    require(k >= 1, s"greedy selection needs k >= 1, got $k")
    val num = lambdaNum
    val rest = lambdaDen - lambdaNum
    val steps = (2 to k).map { i =>
      s"""prev$i AS (${(1 until i).map(j => s"SELECT q_id, nid FROM sel$j")
            .mkString(" UNION ALL ")}),
         |sel$i AS (
         |  SELECT q_id, nid, CAST($i AS BIGINT) AS rk, score AS mmr_e7 FROM (
         |    SELECT m.*, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, nid) AS rn
         |    FROM (
         |      SELECT p.q_id, p.nid,
         |        $num * p.relppm - $rest * MAX(s.simppm) AS score
         |      FROM pool p
         |      JOIN prev$i t ON t.q_id = p.q_id
         |      JOIN sims s ON s.q_id = p.q_id AND s.id_a = p.nid AND s.id_b = t.nid
         |      WHERE NOT EXISTS (SELECT 1 FROM prev$i x
         |                        WHERE x.q_id = p.q_id AND x.nid = p.nid)
         |      GROUP BY p.q_id, p.nid, p.relppm) m) z
         |  WHERE rn = 1)""".stripMargin
    }
    // mkString over sel1 ∪ steps: k = 1 emits sel1 alone with no
    // dangling comma (steps is empty there)
    (Seq(
      s"""sel1 AS (
         |  SELECT q_id, nid, CAST(1 AS BIGINT) AS rk,
         |    $num * relppm AS mmr_e7 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY relppm DESC, nid) AS rn
         |    FROM pool) z
         |  WHERE rn = 1)""".stripMargin) ++ steps).mkString(",\n")
  }

  /** Driver-side reference implementation — identical pool, sims, and
    * greedy recurrence, but the selection loop runs over collected maps
    * on the driver. Retained as the equivalence baseline for the
    * executor-side path (MmrRerankSpec pins byte-identical output);
    * fine for small query batches, not the scale path. */
  private[graft] def diversifiedTopKDriver(
      queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, poolSize: Int, k: Int,
      lambdaNum: Int = 7, lambdaDen: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    val (pool, sims) = poolAndSims(queries, corpus, idCol, vecCol,
      poolSize, k, lambdaNum, lambdaDen)
    // bounded collects: |q|·pool and |q|·pool² rows — final-answer scale
    val rels = pool.select("q_id", "nid", "relppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val simMap = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val byQuery = rels.keys.groupBy(_._1).view
      .mapValues(ks => ks.map(_._2).toSeq).toMap
    val out = byQuery.toSeq.sortBy(_._1).flatMap { case (qid, cands) =>
      val qRels = cands.map(c => c -> rels((qid, c))).toMap
      val qSims = simMap.collect { case ((q, a, b), v) if q == qid => (a, b) -> v }
      greedy(qid, qRels, qSims.toMap, k, lambdaNum, lambdaDen)
        .map { case (q, rk, n, sc) => Row(q, rk, n, sc) }
    }
    val schema = StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("rk", LongType, nullable = false),
      StructField("neighbor", LongType, nullable = false),
      StructField("mmr_e7", LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }

  /** Shared distributed front half: bounded candidate pool (persisted;
    * released by the caller's clearCache) and its pairwise 6dp-grid
    * cosine similarities, both in exact ppm integers. */
  private def poolAndSims(queries: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, poolSize: Int,
                          k: Int, lambdaNum: Int, lambdaDen: Int)
      : (DataFrame, DataFrame) = {
    require(poolSize >= k && k >= 1, s"need poolSize >= k >= 1, got $poolSize/$k")
    require(lambdaNum > 0 && lambdaNum <= lambdaDen,
      s"need 0 < lambdaNum <= lambdaDen, got $lambdaNum/$lambdaDen")
    val spark = corpus.sparkSession
    graft.functions.DotProduct.register(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct.dotProduct(a, b)
    // zero-norm vectors have no cosine: their rel would be NaN, which
    // sorts FIRST under rel DESC (guaranteed into the pool) and then
    // crashes the integer lift — exclude them on both sides up front
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_emb"))
      .filter(dot(col("q_emb"), col("q_emb")) > 0.0)
    val e = corpus.select(col(idCol).as("nid"), col(vecCol).as("emb"))
      .filter(dot(col("emb"), col("emb")) > 0.0)
    val w = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("nid"))
    val pool = broadcast(q).join(e, col("nid") =!= col("q_id"))
      .withColumn("rel",
        round(dot(col("q_emb"), col("emb")) /
          (sqrt(dot(col("q_emb"), col("q_emb"))) *
            sqrt(dot(col("emb"), col("emb")))), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= poolSize)
      .select(col("q_id"), col("nid"),
        round(col("rel") * 1e6).cast("long").as("relppm"), col("emb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    pool.count()
    (pool, pairwiseSims(pool))
  }

  /** The integer greedy recurrence, shared verbatim by the executor and
    * driver paths: pick argmax of `num·rel − (den−num)·max_sim`, ties on
    * the lower candidate id; emits (q_id, rk, neighbor, mmr_e7). */
  private def greedy(qid: Long, rels: Map[Long, Long],
                     simMap: Map[(Long, Long), Long], k: Int,
                     lambdaNum: Int, lambdaDen: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val cands = rels.keys.toSeq.sorted
    var selected = Vector.empty[Long]
    val picks = collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    while (selected.size < k && selected.size < cands.size) {
      val remaining = cands.filterNot(selected.contains)
      val scored = remaining.map { c =>
        val ms = if (selected.isEmpty) 0L
          else selected.map(s => simMap((c, s))).max
        c -> (lambdaNum * rels(c) - (lambdaDen - lambdaNum) * ms)
      }
      val best = scored.minBy { case (id, sc) => (-sc, id) }
      selected :+= best._1
      picks += ((qid, selected.size.toLong, best._1, best._2))
    }
    picks.toSeq
  }
}
