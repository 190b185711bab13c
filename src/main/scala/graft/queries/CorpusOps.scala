package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{ConnectedComponents, Decontaminate, MinHashDedup}

/** Corpus-hygiene composition queries — the operators a training-data
  * pipeline runs BETWEEN detection and training: near-dup pairs resolved
  * into dedup clusters (c1), the full pair→cluster→drop pipeline with
  * corpus stats (d14), and benchmark decontamination (c2).
  *
  * The c1/d14 oracles replay the ENTIRE chain in DuckDB: the same MinHash
  * CTE derivation as m1 (`ScaleOps.m1PairsCtes`) feeding a recursive-CTE
  * transitive closure whose per-vertex MIN(reachable id) is exactly the
  * fixed point `ConnectedComponents` converges to — label propagation is
  * schedule-independent precisely so this cross-engine check is possible.
  * The c2 oracle replays the hex60 n-gram overlap join (`PortableHash` is
  * engine-portable for the same reason).
  */
object CorpusOps {

  /** Same threshold as m1 (`ScaleOps.m1MinhashNeardup`): c1/d14 cluster
    * exactly the pair set the m1 query reports. */
  private val NearDupThreshold = 0.3

  /** Eval/corpus boundary for the c2 sweep: doc_id < 50 plays the held-out
    * benchmark, the rest the training corpus. */
  private val EvalSplit = 50L

  private def nearDupEdges(s: SparkSession, dir: String): DataFrame =
    MinHashDedup.nearDuplicates(
        Tables(s, dir, "documents"), "doc_id", "text", NearDupThreshold)
      .select(col("id_a"), col("id_b"))

  /** DuckDB replay of [[ConnectedComponents]] over the m1 pair set: the
    * symmetric edge list, a recursive transitive closure, and MIN over the
    * reachable set per vertex. Ends in a `clusters` CTE (id, component). */
  private val clustersCtes: String =
    s"""${ScaleOps.m1PairsCtes},
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM fpairs
       |  UNION
       |  SELECT id_b, id_a FROM fpairs),
       |reach(id, r) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src),
       |clusters AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)""".stripMargin

  /** c1: near-dup pairs (m1's MinHash output) resolved into dedup clusters
    * with per-cluster size — the keep/drop unit. `component` is the
    * cluster's canonical survivor (minimum doc id), so the row count is
    * the number of surviving documents among near-dups and `n_docs - 1`
    * per row is the drop count. */
  def c1DedupClusters(s: SparkSession, dir: String): DataFrame =
    ConnectedComponents.components(nearDupEdges(s, dir))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("component")

  private val c1Sql: String =
    s"""WITH RECURSIVE $clustersCtes
       |SELECT component, COUNT(*) AS n_docs
       |FROM clusters GROUP BY component ORDER BY component""".stripMargin

  /** d14: the near-dup keep/drop decision composed end-to-end — MinHash
    * pairs → connected components → drop every non-representative
    * (id ≠ component) → per-language corpus stats over the survivors.
    * This is the reason ConnectedComponents exists: dropping one side of
    * each PAIR independently can drop a whole A~B~C cluster or keep two
    * near-dups; the component label gives exactly one survivor.
    *
    * Scale shape: the drop list is |near-dup docs| rows (tiny next to the
    * corpus), anti-joined on the corpus's own hash partitioning; stats
    * are row-local token arithmetic + a |langs|-group aggregate. */
  def d14NeardupDrop(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val dropIds = ConnectedComponents.components(nearDupEdges(s, dir))
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    docs.join(dropIds, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum((length(col("text")) - length(expr("replace(text, ' ', '')")) + 1)
          .cast("long")).as("total_tokens"))
      .orderBy("lang")
  }

  private val d14Sql: String =
    s"""WITH RECURSIVE $clustersCtes,
       |todrop AS (SELECT id FROM clusters WHERE id <> component)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_tokens
       |FROM documents
       |WHERE doc_id NOT IN (SELECT id FROM todrop)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** c2: benchmark decontamination sweep — training documents (doc_id ≥
    * 50) sharing any word 5-gram with the held-out split (doc_id < 50),
    * with distinct-shared-gram and distinct-eval-doc counts. Clean
    * documents are absent: the report is the drop list. */
  def c2Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    Decontaminate.contamination(
        docs.filter(col("doc_id") >= EvalSplit),
        docs.filter(col("doc_id") < EvalSplit),
        "doc_id", "text", n = 5)
      .orderBy("id")
  }

  private val c2Sql: String = {
    val n = 5
    val gram = (1 to n).map(j => s"string_split(text,' ')[i+$j]").mkString(" || ' ' || ")
    s"""WITH gr AS (
       |  SELECT doc_id AS id,
       |    unnest(list_distinct(
       |      CASE WHEN len(string_split(text,' ')) >= $n
       |        THEN list_transform(range(0, len(string_split(text,' ')) - ${n - 1}),
       |          i -> $gram)
       |        ELSE [text] END)) AS g
       |  FROM documents),
       |ch AS (SELECT id, CAST(('0x' || substr(md5(g),1,15)) AS BIGINT) AS gh
       |       FROM gr WHERE id >= $EvalSplit),
       |eh AS (SELECT id AS eval_id, CAST(('0x' || substr(md5(g),1,15)) AS BIGINT) AS gh
       |       FROM gr WHERE id < $EvalSplit)
       |SELECT c.id,
       |  COUNT(DISTINCT c.gh) AS n_shared,
       |  COUNT(DISTINCT e.eval_id) AS n_eval_docs
       |FROM ch c JOIN eh e ON c.gh = e.gh
       |GROUP BY c.id ORDER BY c.id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_dedup_clusters" -> (c1DedupClusters _),
    "c2_decontaminate" -> (c2Decontaminate _),
    "d14_neardup_drop" -> (d14NeardupDrop _))

  val oracles: Map[String, String] = Map(
    "c1_dedup_clusters" -> c1Sql,
    "c2_decontaminate" -> c2Sql,
    "d14_neardup_drop" -> d14Sql)
}
