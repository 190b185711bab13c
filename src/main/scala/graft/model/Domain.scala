package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas and the metric registry for the four reference
  * domains (FIXTURES.md §1–4). Long-format layouts are the engine
  * canon (SURVEY §7.1 "key inversions"): EDGAR's 54 year columns and
  * NOAA's 16 type-pair columns become rows, ERA5's 14 physical tables
  * become one table with a `country` column — wide/sharded originals are
  * reproduced on demand via `ingest.Unpivot` for parity.
  */
object Domain {

  /** NOAA billion-dollar disasters, long form. */
  val noaaLong: StructType = StructType(Seq(
    StructField("Year", IntegerType, nullable = false),
    StructField("disaster_type", StringType, nullable = false),
    StructField("count", IntegerType),
    StructField("cost", DoubleType)))

  val noaaTypes: Seq[String] = Seq(
    "Drought", "Flooding", "Freeze", "Severe Storm",
    "Tropical Cyclone", "Wildfire", "Winter Storm")

  /** FEMA/HUD disaster assistance (reference types kept: REAL for
    * logically-integral counts — SURVEY §7.5 risk 1). */
  val fema: StructType = StructType(Seq(
    StructField("year", IntegerType),
    StructField("event", StringType),
    StructField("incident_number", IntegerType),
    StructField("incident_start", StringType), // M/d/yyyy, parsed on demand
    StructField("incident_end", StringType),
    StructField("state", StringType),
    StructField("incident_type", StringType),
    StructField("valid_ihp_applications", DoubleType),
    StructField("eligible_ihp_applications", DoubleType),
    StructField("ihp_total", DoubleType),
    StructField("pa_total", DoubleType),
    StructField("cdbg_dr_allocation", DoubleType),
    StructField("pa_projects_count", DoubleType)))

  /** ERA5 monthly city means, single long table (14-way sharding →
    * `country` column + partition pruning). */
  val era5: StructType = StructType(Seq(
    StructField("country", StringType, nullable = false),
    StructField("City", StringType, nullable = false),
    StructField("date", StringType, nullable = false), // ISO prefix, LIKE 'YYYY-MM%'
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("metric", StringType, nullable = false),
    StructField("value", DoubleType)))

  /** EDGAR GHG emissions, long form (4 DBs → `gas` column). */
  val edgarLong: StructType = StructType(Seq(
    StructField("gas", StringType, nullable = false),
    StructField("IPCC_annex", StringType),
    StructField("Country_code_A3", StringType),
    StructField("Name", StringType),
    StructField("Substance", StringType),
    StructField("year", IntegerType, nullable = false),
    StructField("value", DoubleType)))

  /** Metric registry: canonical name, aliases, unit, domain routing
    * (SURVEY F18/F19 — the scattered per-client alias lists and unit
    * maps as one table). */
  case class Metric(name: String, aliases: Seq[String], unit: String, domain: String)

  val metrics: Seq[Metric] = Seq(
    // ERA5 df0
    Metric("skin_temperature", Seq("skin temperature", "temperature"), "K", "era5"),
    Metric("total_ozone", Seq("total ozone", "ozone"), "atm-cm", "era5"),
    Metric("wind_speed", Seq("wind speed", "wind"), "m/s", "era5"),
    Metric("surface_pressure", Seq("surface pressure", "pressure"), "Pa", "era5"),
    Metric("high_vegetation_cover", Seq("vegetation cover", "vegetation"), "fraction", "era5"),
    // ERA5 df1
    Metric("uv_radiation", Seq("uv radiation", "uv"), "W/m²", "era5"),
    Metric("snowfall", Seq("snow"), "m", "era5"),
    Metric("net_thermal_radiation", Seq("thermal radiation"), "W/m²", "era5"),
    Metric("total_precipitation", Seq("precipitation", "rainfall", "rain"), "m", "era5"),
    Metric("convective_rain_rate", Seq("convective rain"), "kg/m²/s", "era5"),
    Metric("mean_evaporation_rate", Seq("evaporation"), "kg/m²/s", "era5"),
    Metric("mean_moisture_divergence", Seq("moisture divergence"), "kg/m²/s", "era5"),
    Metric("mean_precipitation_rate", Seq("precipitation rate"), "kg/m²/s", "era5"),
    // FEMA
    Metric("ihp_total", Seq("ihp total", "ihp"), "$", "fema"),
    Metric("pa_total", Seq("pa total", "public assistance"), "$", "fema"),
    Metric("cdbg_dr_allocation", Seq("cdbg", "cdbg-dr"), "$", "fema"),
    Metric("valid_ihp_applications", Seq("valid applications", "applications"), "count", "fema"),
    Metric("eligible_ihp_applications", Seq("eligible applications"), "count", "fema"),
    Metric("pa_projects_count", Seq("pa projects"), "count", "fema"),
    // EDGAR gases
    Metric("CO2", Seq("co2", "carbon dioxide", "co₂"), "kt", "edgar"),
    Metric("CH4", Seq("ch4", "methane"), "kt", "edgar"),
    Metric("N2O", Seq("n2o", "nitrous oxide"), "kt N₂O", "edgar"),
    Metric("F-gas", Seq("fluorinated", "f-gas", "hfc", "sf6"), "kt", "edgar"))

  def metricRegistry(domain: String): Seq[(String, Seq[String])] =
    metrics.filter(_.domain == domain).map(m => m.name -> m.aliases)

  def unitOf(metric: String): String =
    metrics.find(_.name == metric).map(_.unit).getOrElse("")
}
