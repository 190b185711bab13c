package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny deterministic fixture tables mirroring the reference databases
  * (FIXTURES.md §1–4) for golden tests — values chosen so the documented
  * reference verification queries have known answers (e.g. the NOAA
  * notebook's `SUM(...) WHERE Year = 2016` check).
  */
object Fixtures {

  /** NOAA wide rows, normalized names (`Drought_Count`...), 1980 + 2016 +
    * neighbors. 1980 mirrors the reference sample row. */
  def noaaWide(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // (Year, Drought C/C, Flooding, Freeze, Severe Storm, Tropical Cyclone, Wildfire, Winter Storm, totals)
      (1980, 1, 177.1, 1, 11.7, 0, 0.0, 0, 0.0, 1, 9.6, 0, 0.0, 0, 0.0, 3, 198.4),
      (1983, 1, 10.6, 1, 14.0, 1, 7.0, 0, 0.0, 1, 6.6, 0, 0.0, 0, 0.0, 4, 38.2),
      (2010, 0, 0.0, 2, 8.1, 0, 0.0, 2, 4.3, 1, 5.0, 0, 0.0, 0, 0.0, 5, 17.4),
      (2016, 1, 6.4, 4, 19.8, 0, 0.0, 8, 14.8, 1, 11.2, 1, 2.7, 0, 0.0, 15, 54.9),
      (2017, 1, 2.7, 2, 3.2, 1, 1.1, 9, 24.9, 3, 312.1, 1, 21.8, 1, 1.1, 18, 366.9))
      .toDF("Year",
        "Drought_Count", "Drought_Cost", "Flooding_Count", "Flooding_Cost",
        "Freeze_Count", "Freeze_Cost", "Severe_Storm_Count", "Severe_Storm_Cost",
        "Tropical_Cyclone_Count", "Tropical_Cyclone_Cost",
        "Wildfire_Count", "Wildfire_Cost", "Winter_Storm_Count", "Winter_Storm_Cost",
        "Total_Disaster_Count", "Total_Disaster_Cost")
  }

  /** FEMA rows across states/types/years incl. the doc-corpus entities
    * (CA earthquakes 2019, TX tornadoes 2000–2010, NC Hurricane Isabel). */
  def fema(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (2003, "North Carolina Hurricane Isabel", 1490, "9/18/2003", "9/29/2003",
        "NC", "Hurricane", 10963.0, 5519.0, 2.62e7, 1.55e8, 3.5e7, 892.0),
      (2005, "Louisiana Hurricane Katrina", 1603, "8/29/2005", "10/1/2005",
        "LA", "Hurricane", 1190438.0, 707242.0, 5.2e9, 1.32e10, 1.34e10, 12334.0),
      (2008, "Texas Hurricane Ike", 1791, "9/7/2008", "10/2/2008",
        "TX", "Hurricane", 792935.0, 292932.0, 5.7e8, 2.6e9, 3.1e9, 6231.0),
      (2004, "Texas Tornado", 1526, "5/1/2004", "5/3/2004",
        "TX", "Tornado", 1200.0, 600.0, 2.1e6, 8.5e6, 0.0, 41.0),
      (2015, "Texas Tornado Outbreak", 4223, "12/26/2015", "12/28/2015",
        "TX", "Tornado", 8300.0, 3100.0, 1.8e7, 4.4e7, 7.4e7, 220.0),
      (2019, "California Earthquakes", 4453, "7/4/2019", "7/12/2019",
        "CA", "Earthquake", 2342.0, 712.0, 2.9e6, 4.6e7, 0.0, 118.0),
      (2012, "California Earthquake", 4158, "3/10/2012", "3/12/2012",
        "CA", "Earthquake", 510.0, 200.0, 8.0e5, 3.1e6, 0.0, 23.0),
      (2012, "Texas Hurricane", 4062, "6/12/2012", "6/19/2012",
        "TX", "Hurricane", 3120.0, 1411.0, 4.2e6, 1.9e7, 0.0, 77.0),
      (2007, "Florida Tornado", 1679, "2/2/2007", "2/3/2007",
        "FL", "Tornado", 950.0, 410.0, 1.6e6, 5.2e6, 0.0, 29.0))
      .toDF("year", "event", "incident_number", "incident_start", "incident_end",
        "state", "incident_type", "valid_ihp_applications", "eligible_ihp_applications",
        "ihp_total", "pa_total", "cdbg_dr_allocation", "pa_projects_count")
  }

  /** ERA5 long rows: (country, City, date, lat, lon, metric, value) for
    * the doc-corpus cities/metrics/dates. */
  def era5(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("india", "Mumbai", "2021-06-01", 19.08, 72.88, "wind_speed", 5.8),
      ("india", "Mumbai", "2021-07-01", 19.08, 72.88, "wind_speed", 6.2),
      ("india", "Delhi", "2020-04-01", 28.61, 77.21, "skin_temperature", 306.4),
      ("india", "Delhi", "2020-04-01", 28.61, 77.21, "total_ozone", 0.285),
      ("india", "Delhi", "2020-05-01", 28.61, 77.21, "skin_temperature", 311.2),
      ("bangladesh", "Dhaka", "2020-06-01", 23.81, 90.41, "total_precipitation", 0.42),
      ("bangladesh", "Dhaka", "2020-07-01", 23.81, 90.41, "total_precipitation", 0.55),
      ("srilanka", "Colombo", "2020-06-01", 6.93, 79.85, "total_precipitation", 0.31),
      ("srilanka", "Colombo", "2020-07-01", 6.93, 79.85, "total_precipitation", 0.18),
      ("pakistan", "Karachi", "2022-04-01", 24.86, 67.0, "wind_speed", 4.9),
      ("india", "Delhi", "2022-04-01", 28.61, 77.21, "skin_temperature", 308.9),
      ("india", "Mumbai", "2020-04-01", 19.08, 72.88, "wind_speed", 5.1),
      ("india", "Mumbai", "2020-04-01", 19.08, 72.88, "total_ozone", 0.276),
      ("pakistan", "Karachi", "2020-04-01", 24.86, 67.0, "wind_speed", 5.5),
      ("pakistan", "Karachi", "2020-04-01", 24.86, 67.0, "total_ozone", 0.268),
      ("nepal", "Kathmandu", "2020-06-01", 27.72, 85.32, "total_precipitation", 0.61),
      ("nepal", "Kathmandu", "2020-07-01", 27.72, 85.32, "total_precipitation", 0.73))
      .toDF("country", "City", "date", "latitude", "longitude", "metric", "value")
  }

  /** EDGAR wide rows (subset of years) with `Y_`-prefixed headers as in
    * the raw XLSX, for the strip-prefix ingest path. */
  def edgarWideRaw(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Non-Annex_I", "CHN", "China", "CO2", 10275.1, 10717.4, 11030.0),
      ("Non-Annex_I", "BRA", "Brazil", "CH4", 20554.0, 20783.1, 21002.9),
      ("Annex_I", "USA", "United States", "CO2", 5007.3, 4900.1, 5222.2),
      // ARE's code collides with the English word "are" — pins the
      // all-caps-only code matching in ClimateEngine.edgarAnswer
      ("Non-Annex_I", "ARE", "United Arab Emirates", "CO2", 201.1, 222.4, 241.9))
      .toDF("IPCC_annex", "Country_code_A3", "Name", "Substance", "Y_2015", "Y_2018", "Y_2020")
  }

  /** Gazetteer for reverse-geocode tests. */
  def gazetteer(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Mumbai", "india", 19.076, 72.877),
      ("Delhi", "india", 28.614, 77.209),
      ("Dhaka", "bangladesh", 23.810, 90.412),
      ("Colombo", "srilanka", 6.927, 79.861),
      ("Karachi", "pakistan", 24.861, 67.010),
      ("Kathmandu", "nepal", 27.717, 85.324))
      .toDF("city", "country", "lat", "lon")
  }
}
