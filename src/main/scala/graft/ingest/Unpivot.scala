package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long layout conversions for the two reference wide layouts
  * (SURVEY §2.8). The long form is the engine's canonical layout — the
  * reference's per-year-column addressing and per-type column assembly
  * become ordinary filters — while `pivot` reproduces the original wide
  * tables for display/oracle parity (§7.5 risk 5: exact column order).
  */
object Unpivot {

  /** EDGAR wide years → long (year Int, value Double). idCols stay,
    * every 4-digit column becomes a row. */
  def edgarToLong(wide: DataFrame, idCols: Seq[String]): DataFrame = {
    val yearCols = wide.columns.filter(_.matches(raw"\d{4}"))
    wide.unpivot(idCols.map(col).toArray, yearCols.map(col).toArray, "year", "value")
      .withColumn("year", col("year").cast("int"))
  }

  /** Long → EDGAR wide: pivot years back to columns in ascending order. */
  def edgarToWide(long: DataFrame, idCols: Seq[String], years: Seq[Int]): DataFrame =
    long.groupBy(idCols.map(col): _*)
      .pivot("year", years.map(_.toString))
      .agg(first(col("value")))

  /** NOAA wide type-pairs (`{T} Count`/`{T} Cost` after name
    * normalization: `{T}_Count`/`{T}_Cost`) → long
    * (year, disaster_type, count, cost). */
  def noaaToLong(wide: DataFrame, types: Seq[String]): DataFrame = {
    val rows = types.map { t =>
      struct(lit(t).as("disaster_type"),
        col(s"${t.replace(" ", "_")}_Count").as("count"),
        col(s"${t.replace(" ", "_")}_Cost").as("cost"))
    }
    wide.select(col("Year"), explode(array(rows: _*)).as("r"))
      .select(col("Year"), col("r.disaster_type"), col("r.count"), col("r.cost"))
  }

  /** Long → NOAA wide, reproducing `{T}_Count`/`{T}_Cost` column pairs in
    * the reference's type order. */
  def noaaToWide(long: DataFrame, types: Seq[String]): DataFrame = {
    val aggs = types.flatMap { t =>
      val k = t.replace(" ", "_")
      Seq(
        // cast back to the wide schema's exact types (sum widens int→long)
        sum(when(col("disaster_type") === t, col("count"))).cast("int").as(s"${k}_Count"),
        sum(when(col("disaster_type") === t, col("cost"))).cast("double").as(s"${k}_Cost"))
    }
    long.groupBy(col("Year")).agg(aggs.head, aggs.tail: _*).orderBy("Year")
  }
}
