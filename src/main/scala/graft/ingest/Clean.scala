package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** ETL cleaning operators replaying the reference notebooks' pandas
  * transformations Spark-first (SURVEY §2: A6, F3, F4, F11, F12, P1, P5).
  */
object Clean {

  /** `df.drop_duplicates()` — exact row dedup. */
  def dropDuplicateRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** `df.fillna(0)` on numeric columns. */
  def fillNumericNulls(df: DataFrame, value: Double = 0.0): DataFrame =
    df.na.fill(value)

  /** Keep a fixed column subset (the 13-of-90 FEMA projection). */
  def project(df: DataFrame, columns: Seq[String]): DataFrame =
    df.select(columns.map(col): _*)

  /** Normalize identifiers: spaces → underscores (NOAA column names with
    * spaces, quoted per-identifier in the reference); returns the rename
    * map alongside for display-name parity. */
  def normalizeNames(df: DataFrame): (DataFrame, Map[String, String]) = {
    val renames = df.columns.map(c => c -> c.replace(" ", "_")).toMap
    (df.withColumnsRenamed(renames), renames.map(_.swap))
  }

  /** Strip a prefix from column names (EDGAR `Y_1970` → `1970`). */
  def stripPrefix(df: DataFrame, prefix: String): DataFrame = {
    val renames = df.columns.collect {
      case c if c.startsWith(prefix) => c -> c.stripPrefix(prefix)
    }.toMap
    df.withColumnsRenamed(renames)
  }

  /** `pd.to_numeric(errors='coerce')` — null on failure via try_cast. */
  def coerceNumeric(df: DataFrame, columns: Seq[String], to: DataType): DataFrame =
    columns.foldLeft(df)((d, c) => d.withColumn(c, col(c).try_cast(to)))

  /** Title-case a string column (GHG `str.title()` on country names). */
  def titleCase(df: DataFrame, column: String): DataFrame =
    df.withColumn(column, initcap(col(column)))

  /** Parse a string date column with an explicit format (FEMA `M/d/yyyy`
    * vs ERA5 ISO — SURVEY §7.5 "date chaos"); invalid strings → null. */
  def parseDate(df: DataFrame, column: String, format: String): DataFrame =
    df.withColumn(column, to_date(col(column), format))

  /** Null-count profile — `df.isna().sum()` as one aggregate row. */
  def nullProfile(df: DataFrame): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      df.columns.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")): _*)
}
