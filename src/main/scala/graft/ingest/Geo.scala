package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Geographic ETL for the ERA5 pipeline (SURVEY P13, J5, A3): bounding
  * boxes, reverse geocoding as a broadcast nearest-neighbor join, and
  * grid→city collapse.
  *
  * Reverse geocoding is the reference's only genuinely non-relational
  * ETL operator (a per-row `reverse_geocode` package call). Here it is a
  * pure join: grid points × broadcast gazetteer, min haversine per point
  * — no UDF, fully codegen'd, and the gazetteer (thousands of rows) is
  * broadcast so the grid side never shuffles.
  */
object Geo {

  /** Inclusive lat/lon bounding-box filter (per-country boxes in the
    * ERA5 notebook). */
  def bboxFilter(df: DataFrame, latLo: Double, latHi: Double,
                 lonLo: Double, lonHi: Double): DataFrame =
    df.filter(col("latitude").between(latLo, latHi) &&
      col("longitude").between(lonLo, lonHi))

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2)
    * columns — haversine, all built-in math functions. */
  def haversineKm(lat1: org.apache.spark.sql.Column, lon1: org.apache.spark.sql.Column,
                  lat2: org.apache.spark.sql.Column, lon2: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(6371.0) * lit(2.0) * asin(sqrt(a))
  }

  /** Tag each (latitude, longitude) row with its nearest gazetteer city.
    * Gazetteer columns: (city, country, lat, lon); it is broadcast-sized
    * by definition (an offline cities list), so the argmin runs as a
    * per-row `least` over (distance, city, country) structs built from
    * the collected entries — one codegen'd expression, no join, no
    * shuffle, and (unlike a cross-join + min-distance window keyed on
    * coordinates) no collapsing of distinct rows that happen to share a
    * grid point. Ties break on city name. */
  def reverseGeocode(points: DataFrame, gazetteer: DataFrame): DataFrame = {
    val entries = gazetteer.select("city", "country", "lat", "lon").collect()
    require(entries.nonEmpty, "empty gazetteer")
    val cands = entries.map { r =>
      struct(
        haversineKm(col("latitude"), col("longitude"),
          lit(r.getDouble(2)), lit(r.getDouble(3))).as("d"),
        lit(r.getString(0)).as("city"),
        lit(r.getString(1)).as("country"))
    }
    points.withColumn("_g_best", least(cands.toIndexedSeq: _*))
      .withColumn("City", col("_g_best.city"))
      .withColumn("Country", col("_g_best.country"))
      .drop("_g_best")
  }

  /** Collapse grid points to per-(City, date) means over every numeric
    * column (the notebook's `groupby(["City","date"]).mean()`). */
  def cityMonthMeans(df: DataFrame, numericCols: Seq[String]): DataFrame =
    df.groupBy(col("City"), col("date"))
      .agg(
        avg(col(numericCols.head)).as(numericCols.head),
        numericCols.tail.map(c => avg(col(c)).as(c)): _*)
}
