package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search over a document corpus: BM25 relevance scoring for a
  * fixed query-term set and per-document TF-IDF distinctive terms — the
  * retrieval ops a training-data pipeline runs for corpus exploration and
  * quality triage (ref `RAG_Disaster_Assistance/ingest.py:34-41` ranks
  * retrieved chunks; this is the in-engine, no-external-index form).
  *
  * Both scores are written in engine-exact double arithmetic so the DuckDB
  * oracle replays them bit-for-bit: every floating-point step is a single
  * correctly-rounded IEEE op (+, −, ×, ÷) on identical operands in an
  * identical evaluation order, and every constant (k1 = 1.5, b = 0.75,
  * k1+1 = 2.5, 1−b = 0.25) is an exact binary double. The standard
  * `ln`-based idf is deliberately replaced by the odds ratio
  * `(N − df + 0.5) / (df + 0.5)` it is the log of: transcendental
  * functions are NOT correctly rounded and their last-ulp behavior is
  * libm-specific, which would make cross-engine hash comparison
  * meaningless. Per-term idf ordering is identical (log is monotone).
  */
object KeywordSearch {

  /** BM25 length-normalization constants — chosen inside the standard
    * tuning ranges (k1 ∈ [1.2, 2.0], b = 0.75) such that k1, b, k1+1 and
    * 1−b are all exactly representable doubles (see object doc). */
  val K1 = 1.5
  val B = 0.75

  /** Inverted-index building block: one row per (term, document) posting
    * with its term frequency. At 100 TB this materializes as a table
    * bucketed on `term` — candidate generation for any keyword query is
    * then a bucket-local probe (same layout argument as
    * [[MinHashDedup.DedupIndex]]'s band table). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term"), col("id"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document log-free BM25 score for a fixed term set.
    *
    * Shape: the term list is a compile-time constant, so each term's tf is
    * a row-local array scan (no explode, no per-term shuffle) and the
    * corpus statistics (N, Σdl, per-term df) collapse to ONE broadcast row
    * — the whole query is a scan + a 1-row broadcast join + row-local
    * arithmetic, which survives any corpus size. Term scores are summed in
    * list order (deterministic — a groupBy over exploded terms would sum
    * doubles in shuffle order).
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = split(col(textCol), " ")
    val base = docs.select(
      col(idCol).as("id") +: size(toks).as("dli") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, w => w === lit(t))).as(s"tf_$i")
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("n"),
      sum(col("dli").cast("long")).as("sumdl") +:
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i")): _*)
    base.crossJoin(broadcast(stats))
      .select(col("id"), scoreColumn(terms).as("score"))
  }

  /** The BM25 scoring expression over the canonical stat columns
    * (`tf_i`, `dli` per doc; `n`, `sumdl`, `df_i` broadcast) — factored
    * out so the corpus-rescan path ([[bm25]]) and the at-rest
    * inverted-index serving path (SearchOps k6) build the IDENTICAL
    * expression tree: same operands, same order, bit-identical doubles. */
  private[graft] def scoreColumn(terms: Seq[String]): Column = {
    val nD = col("n").cast("double")
    val avgdl = col("sumdl").cast("double") / nD
    val termScores = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = (nD - df + lit(0.5)) / (df + lit(0.5))
      val norm = tf + lit(K1) * (lit(1.0 - B) + (lit(B) * col("dli").cast("double")) / avgdl)
      when(col(s"tf_$i") > 0, idf * ((tf * lit(K1 + 1.0)) / norm)).otherwise(lit(0.0))
    }
    round(termScores.reduce(_ + _), 6)
  }

  /** DuckDB replay of [[bm25]] ending in a `sc(id, score)` CTE — one SQL
    * fragment per Column expression above, same operand order.
    * `textExpr` lets a caller replay a TRANSFORMED corpus (k15's as-of
    * oracle scores the text each doc HAD at the time-travel point); the
    * default replays the table column verbatim. `docsWhere` restricts
    * the corpus to a metadata SLICE — the stats (n, sumdl, df) then
    * describe the slice, matching [[bm25]] over a filtered frame (h6's
    * "search this tenant's collection" semantic). */
  def bm25Ctes(terms: Seq[String], textExpr: String = "text",
      docsWhere: String = ""): String = {
    val where = if (docsWhere.isEmpty) "" else s" WHERE $docsWhere"
    // SQL-literal escaping: the Spark side takes terms via lit() which is
    // injection-safe by construction; the replay string must double any
    // single quote to stay parseable (and equivalent)
    def q(t: String) = t.replace("'", "''")
    val tfDefs = terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, w -> w = '${q(t)}')) AS tf_$i"
    }.mkString(",\n    ")
    val dfDefs = terms.indices.map(i =>
      s"SUM(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i").mkString(", ")
    val avgdl = "(CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    val termScores = terms.indices.map { i =>
      val tf = s"CAST(tf_$i AS DOUBLE)"
      val df = s"CAST(df_$i AS DOUBLE)"
      val idf = s"((CAST(n AS DOUBLE) - $df + 0.5) / ($df + 0.5))"
      val norm = s"($tf + 1.5 * (0.25 + (0.75 * CAST(dli AS DOUBLE)) / $avgdl))"
      s"CASE WHEN tf_$i > 0 THEN $idf * (($tf * 2.5) / $norm) ELSE 0.0 END"
    }.mkString("\n      + ")
    s"""base AS (
       |  SELECT doc_id AS id, string_split($textExpr, ' ') AS toks
       |  FROM documents$where),
       |tf AS (
       |  SELECT id, len(toks) AS dli,
       |    $tfDefs
       |  FROM base),
       |st AS (
       |  SELECT COUNT(*) AS n, SUM(dli) AS sumdl, $dfDefs FROM tf),
       |sc AS (
       |  SELECT id,
       |    ROUND($termScores, 6) AS score
       |  FROM tf, st)""".stripMargin
  }

  /** Per-document most-distinctive term by TF-IDF, with idf as the exact
    * ratio N/df (log-free for the same cross-engine-exactness reason as
    * [[bm25]]; argmax per document is invariant under the monotone log).
    *
    * Shape: the real inverted-index plan — explode to postings, partial
    * count-agg on (id, term), df via a count window partitioned on `term`
    * (one shuffle; per-term partitions hold ≤ |docs| counted rows, no
    * buffering), N as a 1-row broadcast, then a per-document row_number
    * window (second shuffle, back to document partitioning). Both window
    * sorts spill; nothing is corpus-size-proportional on any single node
    * beyond a term's posting list, the classic inverted-index unit.
    */
  def tfidfTopTerm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = postings(docs, idCol, textCol)
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = withDf.crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n").cast("double") / col("df").cast("double")))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") === 1)
      .select(col("id"), col("term").as("top_term"), round(col("score"), 6).as("tfidf"))
  }

  /** DuckDB replay of [[tfidfTopTerm]] ending in a `top(id, top_term,
    * tfidf)` CTE. */
  val tfidfCtes: String =
    """tok AS (
      |  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT id, term, COUNT(*) AS tf FROM tok GROUP BY id, term),
      |wdf AS (SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |sc AS (
      |  SELECT id, term,
      |    CAST(tf AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) AS score
      |  FROM wdf, n),
      |top AS (
      |  SELECT id, term AS top_term, ROUND(score, 6) AS tfidf
      |  FROM (SELECT *, row_number() OVER
      |          (PARTITION BY id ORDER BY score DESC, term) AS rk FROM sc)
      |  WHERE rk = 1)""".stripMargin
}
