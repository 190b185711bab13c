package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1): CSV/Parquet/JDBC readers with
  * schema pinning, table sinks, and catalog introspection — the engine
  * replacements for the reference's SQLite scans, pandas loaders, and
  * `sqlite_master`/`PRAGMA` probes.
  */
object Sources {

  /** CSV with an explicit schema (S2 — `pd.read_csv`). An explicit
    * schema skips the inference pass (one full read at scale) and pins
    * types against drift; `commentPrefix` handles the NOAA raw CSV's
    * leading `#` lines. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          commentPrefix: Option[String] = None): DataFrame = {
    val base = spark.read.option("header", "true").schema(schema)
    commentPrefix.fold(base)(c => base.option("comment", c)).csv(path)
  }

  /** CSV with inference, for exploration only (two passes over the
    * data — never the production path). */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Parquet scan (S1 primary form). Filters/projections compose into
    * the scan via Catalyst (PushedFilters/ReadSchema). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines with an explicit schema (source-family completeness next
    * to S1/S2 — the interchange format event feeds and API dumps arrive
    * in). Same rationale as [[csv]]: pinning the schema skips the
    * inference pass and surfaces drift as nulls instead of silent type
    * changes; `multiLine = true` reads one JSON document per FILE (a
    * non-splittable layout — keep the default line-per-record form for
    * anything large). */
  def json(spark: SparkSession, path: String, schema: StructType,
           multiLine: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("multiLine", multiLine.toString).json(path)

  /** ORC scan (columnar alternative to S1's parquet — same pushdown and
    * pruning behavior via the built-in datasource; the format a
    * Hive-heritage warehouse hands over). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink, optionally partitioned (mirror of [[saveParquet]]). */
  def saveOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** JDBC scan (S1 parity-ingest form, e.g. `jdbc:sqlite:` for reading
    * the reference's own DB files). `partitionColumn` options enable
    * parallel reads; predicates still push to the remote engine. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /** Overwrite table sink (S5 — `to_sql(if_exists="replace")`). */
  def saveTable(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(name)

  /** Parquet sink, optionally partitioned (the 100 TB layout lever:
    * partition columns become directory pruning at read time). */
  def saveParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed table sink: pre-shuffles data into `n` buckets on the join
    * key at WRITE time, so repeated joins/aggregations on that key skip
    * their exchange entirely (the 100 TB lever for fact-fact joins that
    * would otherwise shuffle both sides every query). Requires
    * `saveAsTable` — bucket metadata lives in the catalog. */
  def saveBucketedTable(df: DataFrame, name: String,
                        bucketCols: Seq[String], n: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(n, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)

  /** S6 — `SELECT name FROM sqlite_master` → catalog listing. */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq

  /** S6 — `PRAGMA table_info(t)` → (name, type) pairs. */
  def describeTable(spark: SparkSession, table: String): Seq[(String, String)] =
    spark.catalog.listColumns(table).collect().map(c => c.name -> c.dataType).toSeq

  /** S6 — `SELECT sql FROM sqlite_master` → DDL string. */
  def tableDdl(spark: SparkSession, table: String): String =
    spark.table(table).schema.toDDL

  /** S7 — sample scan for schema discovery. */
  def sample(spark: SparkSession, table: String, n: Int = 5): DataFrame =
    spark.table(table).limit(n)
}
