package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.nlp.{Parsers, Similarity}

/** Ports the reference's parser test semantics (era5test.py cases, FEMA
  * range phrases, NOAA keyword map) plus difflib-parity checks. */
class ParsersSpec extends AnyFunSuite {
  import Parsers._

  // era5test.py: test_extract_dates — "April 2022" → ("2022", "04")
  test("extractDates: month name + year") {
    assert(extractDates("What was the wind speed in April 2022?") ==
      (List("2022"), List("04")))
  }

  // reference quirk: unspecified year → 2020, unspecified months → all 12
  test("extractDates defaults: all months, year 2020") {
    val (years, months) = extractDates("Compare skin temperature and total ozone in Delhi")
    assert(years == List("2020"))
    assert(months == AllMonths)
  }

  test("extractDates: MM/YYYY form") {
    assert(extractDates("rainfall in 06/2021") == (List("2021"), List("06")))
  }

  test("extractYearMonthNlp resolves month-level phrases against the clock") {
    import java.time.LocalDate
    val aug2026 = LocalDate.of(2026, 8, 12)
    assert(extractYearMonthNlp("rainfall last month", aug2026) == Some((2026, 7)))
    assert(extractYearMonthNlp("rainfall this month", aug2026) == Some((2026, 8)))
    assert(extractYearMonthNlp("rainfall next month", aug2026) == Some((2026, 9)))
    assert(extractYearMonthNlp("wind two months ago", aug2026) == Some((2026, 6)))
    assert(extractYearMonthNlp("wind 14 months ago", aug2026) == Some((2025, 6)))
    // year boundary: last month of January is December of the prior year
    assert(extractYearMonthNlp("snow last month", LocalDate.of(2026, 1, 5)) ==
      Some((2025, 12)))
    // "last <monthname>": most recent such month strictly before today's
    assert(extractYearMonthNlp("temp last march", aug2026) == Some((2026, 3)))
    assert(extractYearMonthNlp("temp last september", aug2026) == Some((2025, 9)))
    assert(extractYearMonthNlp("temp last august", aug2026) == Some((2025, 8)))
    assert(extractYearMonthNlp("no dates here", aug2026) == None)
  }

  test("extractDatesNlp: relative month wins over bare-name explicit; explicit path unchanged") {
    val aug2026 = java.time.LocalDate.of(2026, 8, 12)
    // "last march" must NOT fall through to explicit month=03/year-2020
    assert(extractDatesNlp("temperature last march", aug2026) ==
      (List("2026"), List("03")))
    assert(extractDatesNlp("wind speed in June 2021", aug2026) ==
      (List("2021"), List("06")))
    // reference defaults preserved on the non-relative path
    assert(extractDatesNlp("skin temperature in Delhi", aug2026) ==
      (List("2020"), AllMonths))
  }

  test("extractDayNlp resolves day-level phrases against the clock") {
    import java.time.LocalDate
    val aug12 = LocalDate.of(2026, 8, 12)
    assert(extractDayNlp("rain today", aug12) == Some(aug12))
    assert(extractDayNlp("rain yesterday", aug12) == Some(LocalDate.of(2026, 8, 11)))
    assert(extractDayNlp("rain the day before yesterday", aug12) ==
      Some(LocalDate.of(2026, 8, 10)), "longest phrase must win over 'yesterday'")
    assert(extractDayNlp("forecast tomorrow", aug12) == Some(LocalDate.of(2026, 8, 13)))
    assert(extractDayNlp("flooding 3 days ago", aug12) == Some(LocalDate.of(2026, 8, 9)))
    assert(extractDayNlp("flooding three weeks ago", aug12) == Some(LocalDate.of(2026, 7, 22)))
    assert(extractDayNlp("storms last week", aug12) == Some(LocalDate.of(2026, 8, 5)))
    // month boundary: day arithmetic crosses into the prior month/year
    assert(extractDayNlp("rain yesterday", LocalDate.of(2026, 1, 1)) ==
      Some(LocalDate.of(2025, 12, 31)))
    assert(extractDayNlp("no dates here", aug12) == None)
  }

  test("extractDatesNlp: day-level phrase wins and coarsens to (year, month)") {
    val aug1 = java.time.LocalDate.of(2026, 8, 1)
    assert(extractDatesNlp("rainfall yesterday", aug1) == (List("2026"), List("07")))
    // day-level beats month-level when both appear
    assert(extractDatesNlp("rainfall yesterday not last march", aug1) ==
      (List("2026"), List("07")))
    // extractYearNlp sees through day phrases too
    assert(extractYearNlp("flooding two weeks ago", java.time.LocalDate.of(2026, 1, 5))
      == Some(2025))
  }

  test("extractYearNlp resolves month-level phrases to their year (dateparser parity)") {
    assert(extractYearNlp("floods last month", java.time.LocalDate.of(2026, 1, 5)) ==
      Some(2025))
    assert(extractYearNlp("fires two months ago", java.time.LocalDate.of(2026, 8, 12)) ==
      Some(2026))
  }

  test("extractYearFilter precedence: range phrases before bare year") {
    assert(extractYearFilter("between 2000 and 2010") == Some(YearRange(2000, 2010)))
    assert(extractYearFilter("from 2015 to 2020") == Some(YearRange(2015, 2020)))
    assert(extractYearFilter("costs 1980-1984 compared") == Some(YearRange(1980, 1984)))
    // reference strictness (client.py TIME_DIRECTIONAL_PATTERNS): after is
    // strict >, before is strict <, only since is >=
    assert(extractYearFilter("after 2010 in California") == Some(YearCmp(">", 2010)))
    assert(extractYearFilter("since 2005") == Some(YearCmp(">=", 2005)))
    assert(extractYearFilter("before 1995") == Some(YearCmp("<", 1995)))
    assert(extractYearFilter("in 2016") == Some(YearEq(2016)))
    assert(extractYearFilter("no year here") == None)
  }

  test("extractYears: punctuation-adjacent years (documented divergence)") {
    // the NOAA client's isdigit() scan drops "2005?" and only hardcoded
    // 1980/1983 substring fallbacks rescue its demo corpus; the regex
    // handles every year uniformly
    assert(extractYears("How many droughts occurred in 1980?") == List(1980))
    assert(extractYears("total disaster cost in 1983?") == List(1983))
    assert(extractYears("hurricanes in 2005?") == List(2005)) // reference: None
    assert(extractYears("(2016)") == List(2016))
  }

  test("extractComparison: more-than phrases with $ and commas") {
    assert(extractComparison("more than $5,000,000 in aid", "ihp_total") ==
      Some(NumericFilter("ihp_total", ">", 5000000.0)))
    assert(extractComparison("under 300", "x") == Some(NumericFilter("x", "<", 300.0)))
    assert(extractComparison("at least 42.5", "x") == Some(NumericFilter("x", ">=", 42.5)))
  }

  test("extractState: full names and abbreviations") {
    assert(extractState("tornado incidents in Texas") == Some("TX"))
    assert(extractState("Show earthquakes in California after 2010") == Some("CA"))
    assert(extractState("declarations in NC last year") == Some("NC"))
    assert(extractState("nothing here") == None)
  }

  test("extractState: word boundaries and longest-name-wins") {
    // 'arkansas' must not resolve via its 'kansas' substring
    assert(extractState("floods in Arkansas") == Some("AR"))
    assert(extractState("floods in Kansas") == Some("KS"))
    // 'west virginia' must not resolve via its 'virginia' suffix
    assert(extractState("storms in West Virginia") == Some("WV"))
    assert(extractState("storms in Virginia") == Some("VA"))
    // boundary check: a mid-word substring is not a state mention
    assert(extractState("the Texline depot") == None)
  }

  test("extractIncidentType matches the FEMA whitelist incl. plurals") {
    assert(extractIncidentType("Show tornado incidents in Texas") == Some("Tornado"))
    assert(extractIncidentType("hurricanes in 2005") == Some("Hurricane"))
    assert(extractIncidentType("earthquake-related applications") == Some("Earthquake"))
  }

  // era5test.py: test_extract_metrics — both metrics found
  test("detectMetrics: 'skin temperature and total ozone' finds both") {
    val reg = graft.model.Domain.metricRegistry("era5")
    val got = detectMetrics("Compare skin temperature and total ozone in Delhi", reg)
    assert(got.toSet == Set("skin_temperature", "total_ozone"))
  }

  test("detectMetrics: alias and fuzzy fallback") {
    val reg = graft.model.Domain.metricRegistry("era5")
    assert(detectMetrics("how much rainfall in Dhaka", reg) == List("total_precipitation"))
    // typo resolved by fuzzy token match at 0.8
    assert(detectMetrics("what was the snowfal like", reg) == List("snowfall"))
  }

  test("noaaFirstDisaster: exact reference first-hit-wins parity incl. quirks") {
    // new_disaster_c.py iterates DISASTER_COLUMN_MAPPING and breaks on the
    // first `keyword in question` hit
    assert(noaaFirstDisaster("hurricane costs") ==
      Some(("hurricane", Some("Tropical Cyclone"))))
    // quirk preserved: 'storm' precedes 'winter storm' in the map
    assert(noaaFirstDisaster("winter storm damage in 1993") ==
      Some(("storm", Some("Severe Storm"))))
    // reference maps earthquake explicitly to no column
    assert(noaaFirstDisaster("earthquake cost") == Some(("earthquake", None)))
    assert(noaaFirstDisaster("snow damage") == Some(("snow", Some("Winter Storm"))))
    assert(noaaFirstDisaster("sunny day") == None)
  }

  test("noaaDisasterTypes: multi-type engine extension over reference order") {
    assert(noaaDisasterTypes("How many droughts occurred in 1980?") == List("Drought"))
    assert(noaaDisasterTypes("hurricane costs") == List("Tropical Cyclone"))
    assert(noaaDisasterTypes("Compare the flooding and tropical cyclone cost between 1980-1984")
      == List("Flooding", "Tropical Cyclone"))
    // documented divergence from first-hit parity: the longest keyword wins
    // per mention, so 'winter storm' is Winter Storm here (reference quirk
    // would say Severe Storm — see noaaFirstDisaster)
    assert(noaaDisasterTypes("winter storm damage") == List("Winter Storm"))
    assert(noaaDisasterTypes("snow damage") == List("Winter Storm"))
    // earthquake has no NOAA column → contributes nothing
    assert(noaaDisasterTypes("earthquake cost") == Nil)
  }

  test("fuzzyResolve behaves like get_close_matches(n=1, cutoff)") {
    val dim = Seq("Mumbai", "Delhi", "Dhaka", "Colombo")
    assert(fuzzyResolve("mumbay", dim, 0.8) == Some("Mumbai"))
    assert(fuzzyResolve("xyz", dim, 0.8) == None)
    assert(fuzzyResolve("delhi", dim, 0.8) == Some("Delhi"))
  }

  // difflib parity: SequenceMatcher(None, a, b).ratio() reference values
  test("Similarity.ratio matches Python difflib on known pairs") {
    assert(Similarity.ratio("abcd", "bcde") == 0.75)
    assert(Similarity.ratio("", "") == 1.0)
    assert(Similarity.ratio("abc", "") == 0.0)
    assert(math.abs(Similarity.ratio("mumbay", "mumbai") - 10.0 / 12) < 1e-12)
    // transposition case where R/O differs from naive LCS-only scoring
    assert(math.abs(Similarity.ratio("qabxcd", "abycdf") - 8.0 / 12) < 1e-12)
  }

  test("entityCandidates drops stopwords and numbers, keeps bigrams") {
    val c = entityCandidates("What was the wind speed in Mumbai in June 2021?")
    assert(c.contains("Mumbai"))
    assert(c.contains("wind speed"))
    assert(!c.exists(_.toLowerCase == "what"))
    assert(!c.contains("2021"))
  }
}
