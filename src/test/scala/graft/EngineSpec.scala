package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ClimateEngine
import graft.ingest.Unpivot
import graft.model.{Domain, Fixtures}
import graft.query._

/** QuerySpec compiler, SQL gate, and end-to-end golden Q&A over the
  * fixture tables, replaying the reference's documented questions
  * (FIXTURES.md §6). */
class EngineSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val noaaLong =
    Unpivot.noaaToLong(Fixtures.noaaWide(spark), Domain.noaaTypes)
  private lazy val edgarLong =
    Unpivot.edgarToLong(
      graft.ingest.Clean.stripPrefix(Fixtures.edgarWideRaw(spark), "Y_"),
      Seq("IPCC_annex", "Country_code_A3", "Name", "Substance"))
      .withColumn("gas", col("Substance"))
  private lazy val engine = new ClimateEngine(spark, Map(
    "noaa" -> noaaLong, "fema" -> Fixtures.fema(spark),
    "era5" -> Fixtures.era5(spark), "edgar" -> edgarLong))

  // ---- SpecCompiler ---------------------------------------------------

  test("SpecCompiler: filter + group + agg + sort + limit compiles and runs") {
    val spec = QuerySpec("fema",
      where = Seq(Predicate.Eq("state", "TX"), Predicate.Between("year", 2000, 2010)),
      groupBy = Seq("incident_type"),
      aggregations = Seq(Aggregation(AggFn.Sum, "ihp_total", "total"),
        Aggregation(AggFn.Count, "*", "n")),
      orderBy = Seq(Sort("incident_type")), limit = Some(10))
    val rows = SpecCompiler.compile(spec, Map("fema" -> Fixtures.fema(spark))).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("Hurricane", "Tornado"))
  }

  test("SpecCompiler: validation lists all unknown columns at once") {
    val spec = QuerySpec("fema", select = Seq("nope", "state", "alsono"))
    val e = intercept[SpecCompiler.InvalidSpec] {
      SpecCompiler.compile(spec, Map("fema" -> Fixtures.fema(spark)))
    }
    assert(e.problems.size == 2)
  }

  test("SpecCompiler: predicates behave (EqCI, Prefix, In, Or)") {
    val era5 = Fixtures.era5(spark)
    val ci = era5.filter(SpecCompiler.predicate(Predicate.EqCI("City", "mumbai")))
    assert(ci.count() == 2)
    val pre = era5.filter(SpecCompiler.predicate(Predicate.Prefix("date", "2020-06")))
    assert(pre.count() == 2)
    val or = era5.filter(SpecCompiler.predicate(
      Predicate.Or(Seq(Predicate.Eq("City", "Delhi"), Predicate.Eq("City", "Karachi")))))
    assert(or.count() == 4)
  }

  // ---- SqlGate --------------------------------------------------------

  test("SqlGate passes queries, rejects commands at the plan level") {
    Fixtures.fema(spark).createOrReplaceTempView("fema_gate")
    assert(SqlGate.query(spark, "SELECT COUNT(*) AS n FROM fema_gate").collect()(0).getLong(0) == 7)
    intercept[SqlGate.RejectedStatement] {
      SqlGate.check(spark, "DROP TABLE fema_gate")
    }
    intercept[SqlGate.RejectedStatement] {
      SqlGate.check(spark, "INSERT INTO fema_gate VALUES (1)")
    }
    // prefix-check bypass that a SELECT-prefix gate would wave through
    intercept[SqlGate.RejectedStatement] {
      SqlGate.check(spark, "WITH x AS (SELECT 1) INSERT INTO fema_gate SELECT * FROM x")
    }
  }

  // ---- golden Q&A (FIXTURES.md §6 corpus) -----------------------------

  test("NOAA: 'How many droughts occurred in 1980?' → 1") {
    assert(engine.noaaAnswer("How many droughts occurred in 1980?").endsWith("1"))
  }

  test("NOAA: 'What was the total disaster cost in 1983?' sums all types") {
    val a = engine.noaaAnswer("What was the total disaster cost in 1983?")
    assert(a.contains("$38.2 billion"), a)
  }

  test("NOAA: compare flooding and tropical cyclone cost 1980-1984") {
    val a = engine.noaaAnswer("Compare the flooding and tropical cyclone cost between 1980-1984")
    assert(a.contains("Flooding: $25.7 billion"), a)
    assert(a.contains("Tropical Cyclone: $16.2 billion"), a)
  }

  test("FEMA: 'What was the IHP total for California earthquakes in 2019?'") {
    val a = engine.femaAnswer("What was the IHP total for California earthquakes in 2019?")
    assert(a.contains("$2,900,000.00"), a)
  }

  test("FEMA: comparison phrase filters the summed metric ('more than $X')") {
    // metric + comparison: sum of the metric over rows passing the
    // threshold — Katrina (5.2e9) is the only ihp_total > 1e9
    val a = engine.femaAnswer("Which hurricanes had more than $1,000,000,000 in ihp total?")
    assert(a.contains("$5,200,000,000.00"), a)
  }

  test("FEMA: 'Show tornado incidents in Texas between 2000 and 2010' lists rows") {
    val a = engine.femaAnswer("Show tornado incidents in Texas between 2000 and 2010")
    assert(a.contains("Texas Tornado"), a)
    assert(!a.contains("Outbreak"), s"2015 row leaked into 2000-2010 range: $a")
  }

  test("FEMA: 'Show all earthquake-related applications after 2010 in California'") {
    val a = engine.femaAnswer("Show all earthquake-related applications after 2010 in California")
    // applications alias → valid_ihp_applications; CA earthquakes after
    // 2010: 2012 (510) + 2019 (2342) = 2852
    assert(a.contains("2852.0"), a)
  }

  test("ERA5: 'What was the wind speed in April 2022?' (no city → all cities)") {
    val a = engine.era5Answer("What was the wind speed in April 2022?")
    assert(a.contains("Karachi 2022-04 wind_speed: 4.9 m/s"), a)
  }

  test("ERA5: 'What was the wind speed in Mumbai in June 2021?'") {
    val a = engine.era5Answer("What was the wind speed in Mumbai in June 2021?")
    assert(a.contains("Mumbai 2021-06 wind_speed: 5.8 m/s"), a)
    assert(!a.contains("2021-07"), s"unrequested month leaked: $a")
  }

  test("ERA5: compare precipitation in Dhaka and Colombo in 2020 (one plan, two cities)") {
    val a = engine.era5Answer("Compare precipitation in Dhaka and Colombo in 2020")
    assert(a.contains("Dhaka"), a)
    assert(a.contains("Colombo"), a)
  }

  test("ERA5: unspecified year defaults to 2020 (reference quirk)") {
    val a = engine.era5Answer("Compare skin temperature and total ozone in Delhi")
    assert(a.contains("2020-04"), a)
    assert(a.contains("total_ozone"), a)
  }

  test("EDGAR: 'What were the CO2 emissions in China in 2018?'") {
    val a = engine.edgarAnswer("What were the CO2 emissions in China in 2018?")
    assert(a.contains("China 2018: 10717.4 kt"), a)
  }

  test("EDGAR: 'Methane emissions in Brazil from 2015 to 2020' covers interior years") {
    val a = engine.edgarAnswer("Methane emissions in Brazil from 2015 to 2020")
    assert(a.contains("Brazil 2015"), a)
    assert(a.contains("Brazil 2018"), a) // interior year of the range
    assert(a.contains("Brazil 2020"), a)
  }

  // ---- ingest round-trips --------------------------------------------

  test("noaa unpivot∘pivot = id on the wide fixture") {
    val wide = Fixtures.noaaWide(spark)
    val back = Unpivot.noaaToWide(
      Unpivot.noaaToLong(wide, Domain.noaaTypes), Domain.noaaTypes)
    val keep = back.columns
    val orig = wide.select(keep.map(col): _*).orderBy("Year").collect().toSeq
    assert(back.orderBy("Year").collect().toSeq == orig)
  }

  test("edgar strip-prefix + unpivot yields (year,value) rows") {
    val long = edgarLong
    assert(long.filter(col("Name") === "China" && col("year") === 2020)
      .collect()(0).getAs[Double]("value") == 11030.0)
    assert(long.count() == 9) // 3 rows x 3 years
  }

  test("ERA5 ingest pipeline end-to-end: grid -> bbox -> geocode -> city means") {
    import spark.implicits._
    // flattened NetCDF-like grid: 2 points near Mumbai, 1 near Delhi,
    // 1 outside the bbox, over two months
    val grid = Seq(
      ("2020-06-01", 19.0, 72.8, 301.0), ("2020-06-01", 19.2, 73.0, 303.0),
      ("2020-06-01", 28.6, 77.2, 310.0), ("2020-06-01", 52.5, 13.4, 288.0),
      ("2020-07-01", 19.0, 72.8, 299.0), ("2020-07-01", 19.2, 73.0, 301.0))
      .toDF("date", "latitude", "longitude", "skin_temperature")
    val boxed = graft.ingest.Geo.bboxFilter(grid, 6.5, 37.5, 68.0, 97.5)
    assert(boxed.count() == 5, "Berlin point must fall outside the South-Asia bbox")
    val tagged = graft.ingest.Geo.reverseGeocode(boxed, Fixtures.gazetteer(spark))
    val means = graft.ingest.Geo.cityMonthMeans(tagged, Seq("skin_temperature"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(means(("Mumbai", "2020-06-01")) == 302.0) // (301+303)/2
    assert(means(("Mumbai", "2020-07-01")) == 300.0)
    assert(means(("Delhi", "2020-06-01")) == 310.0)
  }

  test("reverse geocode tags grid points with nearest gazetteer city") {
    import spark.implicits._
    val pts = Seq((19.0, 72.9, 5.0), (28.6, 77.2, 7.0)).toDF("latitude", "longitude", "v")
    val got = graft.ingest.Geo.reverseGeocode(pts, Fixtures.gazetteer(spark))
      .select("City").collect().map(_.getString(0)).toSet
    assert(got == Set("Mumbai", "Delhi"))
  }
}
