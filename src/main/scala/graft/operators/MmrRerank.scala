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
  * Scale split: the DISTRIBUTED part is pool extraction (broadcast query
  * batch against the full corpus, exactly the v1/a1/i1 shape — swap in
  * the LSH/IVF variants for a 100 TB corpus) and the pairwise similarity
  * of pool members (|q|·pool² rows, bounded by construction). The greedy
  * selection itself is O(k·pool) per query over an already-bounded pool —
  * driver work of the same class as a final-answer collect, NOT a
  * per-corpus-row loop.
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
    val a = pool.select(col("q_id"), col("nid").as("id_a"), col("emb").as("ea"))
    val b = pool.select(col("q_id"), col("nid").as("id_b"), col("emb").as("eb"))
    val sims = a.join(b, Seq("q_id"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("q_id"), col("id_a"), col("id_b"),
        round(round(dot(col("ea"), col("eb")) /
          (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb")))), 6)
          * 1e6).cast("long").as("simppm"))
    // bounded collects: |q|·pool and |q|·pool² rows — final-answer scale
    val rels = pool.select("q_id", "nid", "relppm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val simMap = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    val byQuery = rels.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
    val out = byQuery.toSeq.sortBy(_._1).flatMap { case (qid, cands) =>
      var selected = Vector.empty[Long]
      val picks = collection.mutable.ArrayBuffer.empty[Row]
      while (selected.size < k && selected.size < cands.size) {
        val remaining = cands.filterNot(selected.contains)
        val scored = remaining.map { c =>
          val ms = if (selected.isEmpty) 0L
            else selected.map(s => simMap((qid, c, s))).max
          c -> (lambdaNum * rels((qid, c)) - (lambdaDen - lambdaNum) * ms)
        }
        val best = scored.minBy { case (id, sc) => (-sc, id) }
        selected :+= best._1
        picks += Row(qid, selected.size.toLong, best._1, best._2)
      }
      picks
    }
    val schema = StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("rk", LongType, nullable = false),
      StructField("neighbor", LongType, nullable = false),
      StructField("mmr_e7", LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }
}
