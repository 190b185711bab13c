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

  /** Gazetteer-size cutoff for [[reverseGeocodeAuto]]: below it the
    * literal-`least` plan is fastest; above it the plan itself becomes the
    * bottleneck (one expression node per gazetteer row — a 10⁵-row
    * gazetteer would blow up codegen/planning long before data size
    * matters), so the bucketed path takes over. */
  val LiteralPathMax = 1000

  /** Scale path for large gazetteers: grid-cell bucketed broadcast join +
    * per-row min-haversine.
    *
    * Build (bounded by gazetteer size, not points): each city is assigned
    * to its `cellDeg`-degree cell and replicated to the 3×3 neighborhood
    * (longitude wraps at ±180°), then grouped into one candidate array per
    * cell. That table (≤ 9·|gazetteer| rows pre-group) is broadcast and
    * equi-joined to points on the cell key — the points side NEVER
    * shuffles, and the per-point argmin is a row-local fold over its
    * cell's candidate array (same (distance, city, country) tie-break as
    * the literal path).
    *
    * Exactness contract: the result is the true nearest city whenever the
    * nearest city lies in the point's 3×3 cell ring — guaranteed when its
    * distance is under `cellDeg` degrees in both axes, i.e. pick `cellDeg`
    * at or above the gazetteer's covering radius (1° ≈ 111 km works for
    * any country-level cities list). Points whose ring holds no city get
    * null City/Country (deep-ocean rows under a too-small `cellDeg`) —
    * they are detectable and re-runnable with a larger cell.
    */
  def reverseGeocodeBucketed(points: DataFrame, gazetteer: DataFrame,
                             cellDeg: Double = 1.0): DataFrame =
    probeGazetteerCells(points, gazetteerCells(gazetteer, cellDeg), cellDeg)

  private def latCellC(c: org.apache.spark.sql.Column, cellDeg: Double) =
    floor((c + lit(90.0)) / lit(cellDeg)).cast("long")
  private def lonCellC(c: org.apache.spark.sql.Column, cellDeg: Double,
      nLon: Int) =
    pmod(floor((c + lit(180.0)) / lit(cellDeg)).cast("long"), lit(nLon.toLong))

  private def nLonOf(cellDeg: Double): Int =
    math.max(1, math.round(360.0 / cellDeg).toInt)

  /** The bucketed gazetteer's cell→candidate-ring table — (cell,
    * cands: array<struct<lat,lon,city,country>>), each city replicated
    * to its 3×3 cell neighborhood (longitude wraps at ±180°). Bounded
    * by 9·|gazetteer| rows pre-group; the gazetteer is static by
    * nature, so deployments LAND this once per gazetteer fingerprint
    * and serve probes from the artifact (geo1s) rather than rebuilding
    * the ring per query. */
  def gazetteerCells(gazetteer: DataFrame, cellDeg: Double): DataFrame = {
    require(cellDeg > 0, "cellDeg must be positive")
    val nLon = nLonOf(cellDeg)
    def key(la: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column) =
      la * lit(nLon.toLong) + lo
    val offsets = for { dla <- -1 to 1; dlo <- -1 to 1 } yield (dla, dlo)
    gazetteer
      .select(col("city"), col("country"), col("lat"), col("lon"),
        latCellC(col("lat"), cellDeg).as("la"),
        lonCellC(col("lon"), cellDeg, nLon).as("lo"))
      .select(col("city"), col("country"), col("lat"), col("lon"),
        explode(array(offsets.map { case (dla, dlo) =>
          key(col("la") + dla, pmod(col("lo") + dlo, lit(nLon.toLong)))
        }: _*)).as("cell"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("lat"), col("lon"),
        col("city"), col("country"))).as("cands"))
  }

  /** The probe side of [[reverseGeocodeBucketed]], over an already-built
    * (or already-LANDED) [[gazetteerCells]] table: broadcast the ring
    * table, equi-join points on their own cell key — the points side
    * NEVER shuffles — and fold each row's candidate array through the
    * codegen'd argmin. `cellDeg` must match the build's. */
  def probeGazetteerCells(points: DataFrame, cells: DataFrame,
                          cellDeg: Double): DataFrame = {
    require(cellDeg > 0, "cellDeg must be positive")
    val nLon = nLonOf(cellDeg)
    graft.functions.NearestEntry.register(points.sparkSession)
    points
      .join(broadcast(cells),
        latCellC(col("latitude"), cellDeg) * lit(nLon.toLong) +
          lonCellC(col("longitude"), cellDeg, nLon) === col("cell"),
        "left")
      // per-row argmin over ~|ring| candidates as ONE codegen'd loop
      // (`nearest_entry`; the composable transform/array_min form runs
      // interpreted and allocates a scored struct per candidate)
      .withColumn("_g_best", graft.functions.NearestEntry.nearestEntry(
        col("latitude"), col("longitude"), col("cands")))
      .withColumn("City", col("_g_best.city"))
      .withColumn("Country", col("_g_best.country"))
      .drop("cell", "cands", "_g_best")
  }

  /** Dispatch: literal-`least` plan for gazetteers up to
    * [[LiteralPathMax]] rows (fastest, exact, zero-join), bucketed
    * broadcast join above it (plan size stays O(1) in gazetteer rows). */
  def reverseGeocodeAuto(points: DataFrame, gazetteer: DataFrame,
                         cellDeg: Double = 1.0): DataFrame =
    // head(n+1) probes partitions incrementally (first partition usually
    // suffices) instead of the full shuffle-free-but-whole-scan job that
    // limit(n+1).count() launches
    if (gazetteer.head(LiteralPathMax + 1).length <= LiteralPathMax)
      reverseGeocode(points, gazetteer)
    else reverseGeocodeBucketed(points, gazetteer, cellDeg)

  /** Collapse grid points to per-(City, date) means over every numeric
    * column (the notebook's `groupby(["City","date"]).mean()`). */
  def cityMonthMeans(df: DataFrame, numericCols: Seq[String]): DataFrame =
    df.groupBy(col("City"), col("date"))
      .agg(
        avg(col(numericCols.head)).as(numericCols.head),
        numericCols.tail.map(c => avg(col(c)).as(c)): _*)
}
