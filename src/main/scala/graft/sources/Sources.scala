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

  /** Small-file compaction: rewrite a parquet directory (optionally
    * per-partition) into files sized near `targetBytes` — the
    * housekeeping pass every long-running ingest needs (streaming
    * micro-batches and fine partitioning strand thousands of KB-scale
    * files; at 100 TB the scan's task count and the namenode's inode
    * table both scale with file COUNT, not bytes).
    *
    * File count is derived from the CURRENT on-disk footprint (compressed
    * bytes, summed via the Hadoop FileSystem so any scheme works — the
    * StreamOps ADVICE precedent), never from row counts: parquet's
    * compression ratio varies too much across schemas for a row heuristic.
    * The rewrite is `coalesce` (no shuffle — compaction must move bytes
    * once, not twice); partitioned layouts compact each partition
    * directory independently so pruning survives.
    *
    * Order of operations: the original directory is RENAMED to
    * `<path>__compact_old` FIRST, then read from there and written
    * compacted to the final path. Reading from the never-before-listed
    * staging path matters: Spark's shared FileStatusCache keys directory
    * listings by path with an infinite default TTL, and
    * `FileStatusCache.getOrCreate` hands each caller a fresh client view
    * whose `invalidateAll` cannot evict another client's entries — a
    * rewrite-in-tmp-then-swap design therefore poisons the final path's
    * listing with the pre-compaction file set (FILE_NOT_EXIST on the
    * next read). Crash recovery: the original stays intact at
    * `__compact_old` until the rewrite completes; on failure this method
    * restores it (delete partial output, rename back), and a
    * `__compact_staged` completion marker guards SIGKILL recovery so the
    * delete-root path only runs when the stage rename provably finished
    * (on copy-per-file object stores an interrupted stage fails fast for
    * a manual merge instead of destroying the unmoved half). Requires
    * single-writer access for the staging window. Returns
    * (files before, files after). */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L << 20): (Long, Long) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(root.toUri, hconf)
    def dataFiles(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(p, true)
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) out += f
      }
      out.result()
    }
    val back = new org.apache.hadoop.fs.Path(path + "__compact_old")
    // marker written AFTER the stage rename completes: recovery may only
    // take the delete-root path when it exists. On an object store (S3A)
    // rename is copy-per-file, so a crash MID-stage leaves the originals
    // split across root and back with no marker — deleting root there
    // would destroy the not-yet-moved half. Single-writer access is
    // still required (concurrent readers fail during the staging window).
    val staged = new org.apache.hadoop.fs.Path(path + "__compact_staged")
    // an existing backup means a previous run died mid-rewrite (success
    // deletes it): the backup is then the ONLY complete copy and the
    // root holds partial output. RECOVER it — never delete it, or a
    // re-run after a hard crash (SIGKILL, not an exception) would
    // destroy the data the staging design exists to protect
    if (fs.exists(back)) {
      if (fs.exists(staged)) {
        // stage rename finished: back is complete, root is rewrite debris.
        // Marker goes BEFORE the restore rename: a crash mid-restore then
        // leaves back-without-marker + empty root, which the next run's
        // rename-finished branch below restores — a crash AFTER a rename
        // but before a marker delete would instead leave a stale marker
        // that could later bless deleting a half-moved root
        fs.delete(root, true)
        fs.delete(staged, false)
        if (!fs.rename(back, root)) {
          throw new java.io.IOException(
            s"compactParquet: found interrupted run; could not restore $back")
        }
      } else if (!fs.exists(root)) {
        // crashed in the window between the completed rename and the
        // marker write (root is gone, so the rename DID finish)
        if (!fs.rename(back, root)) {
          throw new java.io.IOException(
            s"compactParquet: found interrupted run; could not restore $back")
        }
      } else {
        // no marker AND both directories populated: a non-atomic rename
        // (copy-per-file object store) died mid-stage — the originals are
        // split across the two paths and neither side is safe to delete
        throw new java.io.IOException(
          s"compactParquet: $back exists without a completion marker while " +
            s"$path is non-empty — a non-atomic stage rename was interrupted; " +
            "merge the two directories manually before re-running")
      }
    }
    // nothing to compact (no data files yet) -> no-op, don't stage
    if (dataFiles(root).isEmpty) return (0L, 0L)
    if (!fs.rename(root, back)) {
      throw new java.io.IOException(s"compactParquet: could not stage $path")
    }
    fs.create(staged, true).close()
    try {
      val before = dataFiles(back)
      // partition directories (key=value segments) compact independently;
      // an unpartitioned directory is a single unit
      val units = before.groupBy(f => f.getPath.getParent).toSeq
      units.foreach { case (dir, files) =>
        val bytes = files.map(_.getLen).sum
        val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        // relativize on qualified Path STRINGS, not URIs: listed paths are
        // scheme-qualified (an unqualified base makes URI.relativize
        // return the ABSOLUTE uri — the write target then resolves back
        // to the staging dir and Overwrite-deletes its own input), and
        // URI percent-encoding would mangle partition names containing
        // space/%/# into literally-escaped directories
        val base = fs.makeQualified(back).toString
        val dirStr = fs.makeQualified(dir).toString
        require(dirStr == base || dirStr.startsWith(base + "/"),
          s"compactParquet: $dirStr is not under $base")
        val rel = dirStr.stripPrefix(base).stripPrefix("/") // "" or "k=v/..."
        val out = if (rel.isEmpty) root else new org.apache.hadoop.fs.Path(root, rel)
        spark.read.parquet(dir.toString)
          .coalesce(n)
          .write.mode(SaveMode.Overwrite).parquet(out.toString)
      }
      // best-effort plan recache for readers that referenced the path
      // before compaction (the LISTING cache was never poisoned for the
      // final path: only the staging path was listed during the rewrite)
      spark.catalog.refreshByPath(path)
      val after = dataFiles(root).size.toLong
      // marker FIRST: a crash between the two deletes must leave
      // back-without-marker (→ the fail-fast merge-manually branch, no
      // data at risk), never marker-without-back — the next run would
      // stage root, crash mid-stage, and recovery would trust the STALE
      // marker into deleting the not-yet-moved half
      fs.delete(staged, false)
      fs.delete(back, true)
      (before.size.toLong, after)
    } catch {
      case e: Throwable =>
        // restore the original — compaction must never half-apply; the
        // marker goes before the rename for the same stale-marker reason
        // as the success path (a crash mid-restore leaves back-without-
        // marker + empty root → the rename-finished branch recovers)
        fs.delete(root, true)
        fs.delete(staged, false)
        if (!fs.rename(back, root)) {
          throw new java.io.IOException(
            s"compactParquet: rewrite failed AND restore failed; " +
              s"original data is at $back", e)
        }
        throw e
    }
  }

  /** Recursive local-filesystem delete — the cleanup every
    * temp-state-scoped query (rolling-wave drivers, artifact eviction)
    * shares instead of re-declaring. Deliberately java.io (driver-local
    * temp dirs), not Hadoop FS. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

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
