package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Tag each (latitude, longitude) row with its nearest gazetteer city:
    * broadcast cross join + min-distance window. Gazetteer columns:
    * (city, country, lat, lon). At scale, pre-bucketing both sides by
    * rounded lat/lon would cut the candidate set; the broadcast form is
    * exact and already shuffle-free on the grid side. */
  def reverseGeocode(points: DataFrame, gazetteer: DataFrame): DataFrame = {
    val g = broadcast(gazetteer.select(
      col("city").as("_g_city"), col("country").as("_g_country"),
      col("lat").as("_g_lat"), col("lon").as("_g_lon")))
    val scored = points.crossJoin(g)
      .withColumn("_g_dist",
        haversineKm(col("latitude"), col("longitude"), col("_g_lat"), col("_g_lon")))
    val w = Window.partitionBy(col("latitude"), col("longitude"))
      .orderBy(col("_g_dist"), col("_g_city"))
    scored.withColumn("_g_rk", row_number().over(w))
      .filter(col("_g_rk") === 1)
      .withColumnsRenamed(Map("_g_city" -> "City", "_g_country" -> "Country"))
      .drop("_g_lat", "_g_lon", "_g_dist", "_g_rk")
  }

  /** Collapse grid points to per-(City, date) means over every numeric
    * column (the notebook's `groupby(["City","date"]).mean()`). */
  def cityMonthMeans(df: DataFrame, numericCols: Seq[String]): DataFrame =
    df.groupBy(col("City"), col("date"))
      .agg(
        avg(col(numericCols.head)).as(numericCols.head),
        numericCols.tail.map(c => avg(col(c)).as(c)): _*)
}
