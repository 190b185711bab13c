package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CorpusOps, EventOps, HybridOps, PipelineOps, Relational, ScaleOps, SearchOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` holds the DuckDB-equivalent SQL
  * for every query that is SQL-expressible. Aliases and ordering are kept
  * identical on both sides (the driver's compare sorts columns by name
  * before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventOps.queries ++ TextOps.queries ++
      VectorOps.queries ++ ScaleOps.queries ++ CorpusOps.queries ++
      SearchOps.queries ++ HybridOps.queries ++ PipelineOps.queries ++
      graft.multimodal.MediaOps.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ ScaleOps.oracles ++ CorpusOps.oracles ++
      SearchOps.oracles ++ HybridOps.oracles ++ PipelineOps.oracles ++
      graft.multimodal.MediaOps.oracles

  /** Large-SF oracle materialization hints — (setup DDL, served SQL)
    * per query whose oracle shares an expensive CTE chain. Local
    * tooling only (`tools/check_oracle.py --use-hints`); the driver's
    * compare reads the self-contained `oracleSql`. */
  def oracleHints: Map[String, (String, String)] = PipelineOps.oracleHints
}
