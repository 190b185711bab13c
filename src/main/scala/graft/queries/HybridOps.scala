package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KeywordSearch

/** Hybrid retrieval: keyword (BM25) and embedding (cosine) rankings
  * fused with reciprocal rank fusion — the serving shape every modern
  * retrieval stack runs (sparse + dense legs, late fusion), expressed
  * Spark-first and exactly replayable by the DuckDB oracle.
  *
  * RRF(doc) = Σ_legs 1 / (K + rank_leg(doc)) over the legs that
  * returned the doc (Cormack/Clarke/Buettcher, SIGIR 2009; K = 60, the
  * paper's constant). Exactness: each contribution is ONE double
  * division on integer operands and the fusion adds exactly TWO doubles
  * (IEEE addition is commutative, so join order cannot perturb bits) —
  * no rounding is needed anywhere after the legs' own pinned grids.
  *
  * Scale shape: each leg is a corpus scan + 1-row broadcast (BM25
  * stats / query vector) + TakeOrdered(legN) — no full sort; the rank
  * windows sit ABOVE the top-k limit, so the single-partition
  * WindowExec is bounded at legN rows by construction; the fusion joins
  * two ≤legN-row frames. At 100 TB only the leg scans grow.
  */
object HybridOps {

  /** Same df spectrum as k1: one rare term (idf-dominated) + two common
    * ones (tf/length-dominated), so the keyword leg exercises the whole
    * scoring range. */
  private val HTerms = Seq("dup", "spark", "vector")

  /** The dense leg's query: vec 0's embedding — `documents` and
    * `embeddings` align 1:1 on id, so fused ids name the same corpus. */
  private val HQueryVec = 0L

  /** Per-leg fusion depth (the production RRF convention is a deep
    * top-1000 per leg): deep enough that the legs OVERLAP — at sf0.01
    * both legs cover the whole corpus, so the two-addend RRF branch
    * (a doc ranked by BOTH legs) is exercised by the oracle, not just
    * the single-leg CASE arms. */
  private val LegN = 1000
  private val RrfK = 60
  private val HTopK = 20

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotProduct(a, b)

  /** The keyword leg: k1's exact BM25 over the corpus, top-[[LegN]] by
    * (score desc, id) — ties broken on id for a total order. */
  private def bm25Leg(s: SparkSession, dir: String): DataFrame =
    KeywordSearch.bm25(Tables(s, dir, "documents"), "doc_id", "text", HTerms)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(LegN)

  /** The dense leg: v1's exact brute-force cosine of every non-query
    * vector against [[HQueryVec]] (1-row broadcast), round-6 grid (the
    * v1 convention), top-[[LegN]] by (cos desc, id). */
  private def cosineLeg(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProduct.register(s)
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.filter(col("vec_id") === HQueryVec)
      .select(col("emb").as("q_emb"))
    e.filter(col("vec_id") =!= HQueryVec)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("id"),
        round(dot(col("q_emb"), col("emb")) /
          (sqrt(dot(col("q_emb"), col("q_emb"))) *
            sqrt(dot(col("emb"), col("emb")))), 6).as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .limit(LegN)
  }

  /** The fusion itself, shared by h1 (at-rest) and h2 (rolling-served
    * keyword leg): rank each ≤[[LegN]]-row leg (windows over already-
    * limited frames — bounded single partitions), full-outer join on
    * doc id, RRF-sum the two contributions, top-[[HTopK]]. Absent-leg
    * ranks surface as 0 (never null — the oracle compare is exact on
    * representation, and 0 is unambiguous since real ranks start at 1). */
  private def fuseRrf(bmLeg: DataFrame, csLeg: DataFrame): DataFrame = {
    val bm = bmLeg.withColumn("rb", row_number()
        .over(Window.orderBy(col("score").desc, col("id"))))
      .select(col("id"), col("rb"))
    val cs = csLeg.withColumn("rc", row_number()
        .over(Window.orderBy(col("cos").desc, col("id"))))
      .select(col("id"), col("rc"))
    def contrib(r: Column): Column =
      when(r.isNull, lit(0.0))
        .otherwise(lit(1.0) / (lit(RrfK) + r).cast("double"))
    bm.join(cs, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("rb").cast("long"), lit(0L)).as("rb"),
        coalesce(col("rc").cast("long"), lit(0L)).as("rc"),
        (contrib(col("rb")) + contrib(col("rc"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(HTopK)
  }

  /** h1: hybrid search at rest — BM25 keyword leg + brute-force cosine
    * leg, RRF-fused. The answer interleaves docs only one leg surfaced
    * with docs both did (the fusion's whole point). */
  def h1HybridRrf(s: SparkSession, dir: String): DataFrame =
    fuseRrf(bm25Leg(s, dir), cosineLeg(s, dir))

  /** h2: the same hybrid answer with the keyword leg served from the
    * ROLLING BM25 segments ([[graft.streaming.StreamOps.bm25IndexBatch]]
    * waves over thirds of the corpus) — and the waves deliberately land
    * a STALE one-token version of the last third first, superseded by a
    * re-land ([[graft.streaming.StreamOps]] tombstones + stats
    * subtraction), so the fused ranking is also an end-to-end check
    * that doc updates cannot leak into hybrid serving. Scores are
    * bit-identical to the corpus scan (the k6/k11 shared-expression
    * guarantee), so the oracle is h1's own SQL. */
  def h2RollingHybrid(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamOps
    val docs = Tables(s, dir, "documents")
    val root = java.nio.file.Files.createTempDirectory("graft_h2_").toString
    try {
      val third = pmod(col("doc_id"), lit(3L))
      val stale = docs.filter(third === 2L)
        .withColumn("text", split(col("text"), " ").getItem(0))
      StreamOps.bm25IndexBatch(docs.filter(third === 0L).unionByName(stale),
        "doc_id", "text", HShards, s"$root/state", 0L)
      StreamOps.bm25IndexBatch(docs.filter(third === 1L),
        "doc_id", "text", HShards, s"$root/state", 1L)
      StreamOps.bm25IndexBatch(docs.filter(third === 2L),
        "doc_id", "text", HShards, s"$root/state", 2L)
      val bmLeg = StreamOps
        .bm25ServeRolling(s, s"$root/state", HTerms, HShards)
        .filter(col("score") > 0)
        .orderBy(col("score").desc, col("id"))
        .limit(LegN)
      val res = fuseRrf(bmLeg, cosineLeg(s, dir))
      // bounded (HTopK rows): materialize before the temp state is deleted
      s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
    } finally {
      graft.sources.Sources.deleteRecursively(new java.io.File(root))
    }
  }

  private val HShards = 8

  /** h3: the SCALE-PATH hybrid — the dense leg served by the real IVF
    * index (i1's coarse-quantizer probe, [[graft.operators.IvfSearch
    * .approxTopK]] at the shared nprobe) instead of the brute scan.
    * This is what a 100 TB deployment actually runs: the keyword leg
    * stays a scan+heap, the dense leg touches only the probed inverted
    * lists, and fusion is unchanged. The oracle composes the shared
    * ivfCtes k-means/probe replay under h1's fusion tail — an
    * approximate leg whose every step is still bit-exact. */
  def h3IvfHybrid(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    val idx = graft.operators.IvfSearch.buildIndex(e, "vec_id", "embedding",
      k = ScaleOps.IvfK, iters = ScaleOps.IvfIters,
      roundDecimals = ScaleOps.IvfRound)
    try {
      val denseLeg = graft.operators.IvfSearch
        .approxTopK(e.filter(col("vec_id") === HQueryVec), idx,
          "vec_id", "embedding", k = LegN, nprobe = ScaleOps.IvfNprobe)
        .select(col("neighbor").as("id"), col("cos"))
      val res = fuseRrf(bm25Leg(s, dir), denseLeg)
      // bounded (HTopK rows): materialize before the index cache closes
      s.createDataFrame(java.util.Arrays.asList(res.collect(): _*), res.schema)
    } finally idx.close()
  }

  /** The keyword leg's CTEs (ending in `bmr(id, rb)`): k1's bm25 chain,
    * the >0 cut, LIMIT-then-rank. */
  private val bmLegSql: String =
    s"""${KeywordSearch.bm25Ctes(HTerms)},
       |bml AS (SELECT id, score FROM sc WHERE score > 0
       |        ORDER BY score DESC, id LIMIT $LegN),
       |bmr AS (SELECT id,
       |          ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rb
       |        FROM bml)""".stripMargin

  /** The fusion tail shared by every hybrid oracle: full-outer join of
    * `bmr`/`csr`, absent ranks as 0, the RRF sum as two CASE-guarded
    * double divisions on integer-added denominators. */
  private val fusedTailSql: String =
    s"""fused AS (
       |  SELECT COALESCE(bmr.id, csr.id) AS doc_id,
       |    COALESCE(rb, 0) AS rb, COALESCE(rc, 0) AS rc,
       |    (CASE WHEN rb IS NULL THEN CAST(0.0 AS DOUBLE)
       |          ELSE CAST(1.0 AS DOUBLE) / CAST($RrfK + rb AS DOUBLE) END
       |     + CASE WHEN rc IS NULL THEN CAST(0.0 AS DOUBLE)
       |            ELSE CAST(1.0 AS DOUBLE) / CAST($RrfK + rc AS DOUBLE) END) AS rrf
       |  FROM bmr FULL OUTER JOIN csr ON bmr.id = csr.id)
       |SELECT doc_id, rb, rc, rrf FROM fused
       |ORDER BY rrf DESC, doc_id LIMIT $HTopK""".stripMargin

  /** DuckDB replay of [[h1HybridRrf]]: k1's bm25 CTE chain for the
    * keyword leg, v1's list_dot_product cosine for the dense leg, the
    * same LIMIT-then-rank structure, h1's fusion tail. */
  private val h1Sql: String =
    s"""WITH $bmLegSql,
       |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb FROM embeddings),
       |q AS (SELECT id AS q_id, emb AS q_emb FROM e WHERE id = $HQueryVec),
       |csl AS (SELECT e.id,
       |          ROUND(list_dot_product(q_emb, emb) /
       |            (sqrt(list_dot_product(q_emb, q_emb)) *
       |             sqrt(list_dot_product(emb, emb))), 6) AS cos
       |        FROM e CROSS JOIN q WHERE e.id <> q.q_id
       |        ORDER BY cos DESC, id LIMIT $LegN),
       |csr AS (SELECT id,
       |          ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS rc
       |        FROM csl),
       |$fusedTailSql""".stripMargin

  /** DuckDB replay of [[h3IvfHybrid]]: the dense leg rides the shared
    * ivfCtes quantizer/probe chain (i1's replay) — candidates are the
    * probed clusters' members, cosine-ranked, then h1's fusion tail. */
  private val h3Sql: String =
    s"""WITH $bmLegSql,
       |e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS emb FROM embeddings),
       |q AS (SELECT id AS q_id, emb AS q_emb FROM e WHERE id = $HQueryVec),
       |${ScaleOps.ivfCtes},
       |cands AS (
       |  SELECT pr.q_emb, a.id, a.emb
       |  FROM pr JOIN af a ON a.cid = pr.cid AND a.id <> pr.q_id),
       |csl AS (SELECT id,
       |          ROUND(list_dot_product(q_emb, emb) /
       |            (sqrt(list_dot_product(q_emb, q_emb)) *
       |             sqrt(list_dot_product(emb, emb))), 6) AS cos
       |        FROM cands
       |        ORDER BY cos DESC, id LIMIT $LegN),
       |csr AS (SELECT id,
       |          ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS rc
       |        FROM csl),
       |$fusedTailSql""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h1_hybrid_rrf" -> (h1HybridRrf _),
    "h2_rolling_hybrid" -> (h2RollingHybrid _),
    "h3_ivf_hybrid" -> (h3IvfHybrid _))

  val oracles: Map[String, String] = Map(
    "h1_hybrid_rrf" -> h1Sql,
    // same answer: the rolling-served keyword leg is bit-identical to
    // the corpus scan after the stale version is superseded
    "h2_rolling_hybrid" -> h1Sql,
    "h3_ivf_hybrid" -> h3Sql)
}
