package graft.nlp

/** Pure question-parsing functions (no Spark dependency) replacing the
  * reference's regex/NER planners. Each function documents the reference
  * behavior it preserves — including the quirks (fallback years, "all
  * months" defaults, first-keyword-wins), which are kept deliberately and
  * pinned by specs rather than silently "fixed".
  *
  * Reference behaviors: year extraction (`GHG_Emissions/EDGARclient.py:
  * 204-208`, `Disaster dollar/client.py:116-124`), range phrases
  * (`Disaster dollar/client.py:167-213`), month parsing
  * (`ERA5_Monthly_Means/era5client.py:186-218`), metric detection
  * (`era5client.py:165-181`), comparison phrases (`client.py:216-228`),
  * NOAA keyword→column map (`Billion_Dollar/new_disaster_c.py:19-34`).
  */
object Parsers {

  // ---- years ----------------------------------------------------------

  private val YearRx = raw"\b(\d{4})\b".r

  /** All 4-digit years within [lo, hi] (reference uses 1970–2023 for
    * EDGAR, 1900–2100 for FEMA).
    *
    * DELIBERATE divergence from the NOAA client (`new_disaster_c.py:52-69`):
    * its `word.isdigit()` token scan misses years with adjacent punctuation
    * ("...in 1980?"), which only its hardcoded `"1980"`/`"1983"` substring
    * fallbacks rescue for the demo corpus. The `\b(\d{4})\b` regex here
    * subsumes both the scan and the fallbacks — identical answers on every
    * reference question, and correct ones for the punctuated years the
    * reference drops (spec-pinned in ParsersSpec). */
  def extractYears(q: String, lo: Int = 1900, hi: Int = 2100): List[Int] =
    YearRx.findAllMatchIn(q).map(_.group(1).toInt).filter(y => y >= lo && y <= hi).toList

  sealed trait YearFilter
  case class YearEq(y: Int) extends YearFilter
  case class YearRange(a: Int, b: Int) extends YearFilter
  case class YearCmp(op: String, y: Int) extends YearFilter // ">=", "<=", ">", "<"

  private val BetweenRx = raw"(?i)between\s+(\d{4})\s+and\s+(\d{4})".r
  private val FromToRx = raw"(?i)from\s+(\d{4})\s+to\s+(\d{4})".r
  private val DashRx = raw"\b(\d{4})\s*[-–]\s*(\d{4})\b".r
  private val AfterRx = raw"(?i)\bafter\s+(\d{4})".r
  private val BeforeRx = raw"(?i)\bbefore\s+(\d{4})".r
  private val SinceRx = raw"(?i)\bsince\s+(\d{4})".r

  /** Range phrases first (between/from-to/dash), then directional, then a
    * bare year → equality — the precedence the FEMA client implements.
    * Directional operators are the reference's exact strictness
    * (`Disaster dollar/client.py:185-189` TIME_DIRECTIONAL_PATTERNS):
    * "after YYYY" is strict `>`, "before YYYY" is strict `<`, and only
    * "since YYYY" is `>=` — so "after 2010" excludes 2010 itself. */
  def extractYearFilter(q: String): Option[YearFilter] =
    BetweenRx.findFirstMatchIn(q).map(m => YearRange(m.group(1).toInt, m.group(2).toInt))
      .orElse(FromToRx.findFirstMatchIn(q).map(m => YearRange(m.group(1).toInt, m.group(2).toInt)))
      .orElse(DashRx.findFirstMatchIn(q).map(m => YearRange(m.group(1).toInt, m.group(2).toInt)))
      .orElse(AfterRx.findFirstMatchIn(q).map(m => YearCmp(">", m.group(1).toInt)))
      .orElse(BeforeRx.findFirstMatchIn(q).map(m => YearCmp("<", m.group(1).toInt)))
      .orElse(SinceRx.findFirstMatchIn(q).map(m => YearCmp(">=", m.group(1).toInt)))
      .orElse(extractYears(q).headOption.map(YearEq))

  // ---- relative dates -------------------------------------------------

  private val WordNums = Map(
    "a" -> 1, "one" -> 1, "two" -> 2, "three" -> 3, "four" -> 4,
    "five" -> 5, "six" -> 6, "seven" -> 7, "eight" -> 8, "nine" -> 9,
    "ten" -> 10)
  private val YearsAgoRx =
    raw"(?i)\b(\d{1,3}|a|one|two|three|four|five|six|seven|eight|nine|ten)\s+years?\s+ago\b".r
  // meteorological seasons (northern), season -> last month of the season
  private val SeasonEnd = Map(
    "spring" -> 5, "summer" -> 8, "fall" -> 11, "autumn" -> 11, "winter" -> 2)
  private val LastSeasonRx = raw"(?i)\blast\s+(spring|summer|fall|autumn|winter)\b".r

  /** Resolve the year of a relative or absolute date phrase — the engine
    * analog of the reference's spaCy-DATE + `dateparser.parse` step
    * (`Disaster dollar/client.py:110-124`: first DATE entity whose parsed
    * year lands in [1900, 2100], else the first bare 4-digit token).
    * `dateparser` resolves relative phrases against the wall clock; here
    * the clock is an explicit `today` argument so resolution is
    * deterministic and testable. Covered phrase classes (the documented
    * subset — full dateparser generality is out of scope): explicit years,
    * "last/this/next year", "N years ago" (digits or number words), and
    * "last <season>" (most recently COMPLETED season: "last summer" asked
    * in 2026-01 → 2025; "last winter" asked in 2026-08 → the Jan–Feb 2026
    * winter). Explicit years win, mirroring the reference's
    * first-match-in-question-order behavior on its corpus. */
  def extractYearNlp(q: String, today: java.time.LocalDate): Option[Int] = {
    val lower = q.toLowerCase
    def relative: Option[Int] =
      YearsAgoRx.findFirstMatchIn(q).map { m =>
        val tok = m.group(1).toLowerCase
        today.getYear - WordNums.getOrElse(tok, tok.toInt)
      }.orElse(LastSeasonRx.findFirstMatchIn(q).map { m =>
        val end = SeasonEnd(m.group(1).toLowerCase)
        if (today.getMonthValue > end) today.getYear else today.getYear - 1
      }).orElse {
        if (lower.contains("last year")) Some(today.getYear - 1)
        else if (lower.contains("this year") || lower.contains("current year"))
          Some(today.getYear)
        else if (lower.contains("next year")) Some(today.getYear + 1)
        else None
      // month- and day-granularity phrases resolve to their year too —
      // the reference's dateparser.parse("last month"/"yesterday") yields
      // a full date whose .year passes the 1900-2100 gate
      // (`client.py:110-115`)
      }.orElse(extractYearMonthNlp(q, today).map(_._1))
        .orElse(extractDayNlp(q, today).map(_.getYear))
    extractYears(q).headOption.orElse(relative).filter(y => y >= 1900 && y <= 2100)
  }

  // ---- months ---------------------------------------------------------

  private val MonthNames = List(
    "january" -> "01", "february" -> "02", "march" -> "03", "april" -> "04",
    "may" -> "05", "june" -> "06", "july" -> "07", "august" -> "08",
    "september" -> "09", "october" -> "10", "november" -> "11", "december" -> "12")

  private val MmYyyyRx = raw"\b(\d{1,2})[/-](\d{4})\b".r

  val AllMonths: List[String] = MonthNames.map(_._2)

  /** ERA5 date semantics: explicit months via name or MM/YYYY; defaults
    * are ALL months and year 2020 when unspecified (the reference's
    * documented quirk, `era5client.py:211-215`). Returns (years, months)
    * as zero-padded strings. */
  def extractDates(q: String): (List[String], List[String]) = {
    val lower = q.toLowerCase
    val mmYears = MmYyyyRx.findAllMatchIn(q).map(_.group(2)).toList
    val mmMonths = MmYyyyRx.findAllMatchIn(q)
      .map(m => f"${m.group(1).toInt}%02d").toList
    val nameMonths = MonthNames.collect { case (n, num) if lower.contains(n) => num }
    val years = (mmYears ++ extractYears(q, 1900, 2100).map(_.toString)).distinct
    val months = (mmMonths ++ nameMonths).distinct
    (if (years.nonEmpty) years else List("2020"),
     if (months.nonEmpty) months else AllMonths)
  }

  // ---- relative months ------------------------------------------------

  private val MonthNum: Map[String, Int] =
    MonthNames.map { case (n, s) => n -> s.toInt }.toMap
  private val MonthsAgoRx =
    raw"(?i)\b(\d{1,3}|a|one|two|three|four|five|six|seven|eight|nine|ten)\s+months?\s+ago\b".r
  private val LastMonthNameRx =
    (raw"(?i)\blast\s+(" + MonthNames.map(_._1).mkString("|") + raw")\b").r

  /** Month-granularity relative dates against the injectable clock — the
    * engine analog of the reference's `dateparser` resolving "last month"
    * / "two months ago" (`Disaster dollar/client.py:110-115`). Covered
    * phrases: "last/this/current/next month", "N months ago" (digits or
    * number words), and "last <monthname>" (the most recent such month
    * strictly before the current one: "last march" asked 2026-08 → 2026-03,
    * "last september" asked 2026-08 → 2025-09, "last august" asked
    * 2026-08 → 2025-08). Returns (year, month). */
  def extractYearMonthNlp(q: String, today: java.time.LocalDate): Option[(Int, Int)] = {
    val lower = q.toLowerCase
    def ym(d: java.time.LocalDate) = (d.getYear, d.getMonthValue)
    MonthsAgoRx.findFirstMatchIn(q).map { m =>
      val tok = m.group(1).toLowerCase
      ym(today.minusMonths(WordNums.getOrElse(tok, tok.toInt).toLong))
    }.orElse(LastMonthNameRx.findFirstMatchIn(lower).map { m =>
      val mo = MonthNum(m.group(1))
      (if (mo < today.getMonthValue) today.getYear else today.getYear - 1, mo)
    }).orElse {
      if (lower.contains("last month")) Some(ym(today.minusMonths(1)))
      else if (lower.contains("this month") || lower.contains("current month"))
        Some(ym(today))
      else if (lower.contains("next month")) Some(ym(today.plusMonths(1)))
      else None
    }
  }

  // ---- relative days --------------------------------------------------

  private val DaysAgoRx =
    raw"(?i)\b(\d{1,4}|a|one|two|three|four|five|six|seven|eight|nine|ten)\s+days?\s+ago\b".r
  private val WeeksAgoRx =
    raw"(?i)\b(\d{1,3}|a|one|two|three|four|five|six|seven|eight|nine|ten)\s+weeks?\s+ago\b".r

  /** Day-granularity relative dates against the injectable clock —
    * completes the `dateparser` family below the month level (the
    * reference's `dateparser.parse` accepts "yesterday"/"3 weeks ago";
    * no reference query filters finer than month, so these resolve to a
    * full date that coarsens into the year/month filters). Covered:
    * "today", "yesterday", "tomorrow", "the day before yesterday",
    * "N days ago", "N weeks ago", "last week" (digits or number words). */
  def extractDayNlp(q: String, today: java.time.LocalDate): Option[java.time.LocalDate] = {
    val lower = q.toLowerCase
    def n(tok: String): Long = WordNums.getOrElse(tok.toLowerCase, tok.toInt).toLong
    DaysAgoRx.findFirstMatchIn(q).map(m => today.minusDays(n(m.group(1))))
      .orElse(WeeksAgoRx.findFirstMatchIn(q).map(m => today.minusWeeks(n(m.group(1)))))
      .orElse {
        // longest phrase first: "day before yesterday" contains "yesterday"
        if (lower.contains("day before yesterday")) Some(today.minusDays(2))
        else if (lower.contains("yesterday")) Some(today.minusDays(1))
        else if (lower.contains("tomorrow")) Some(today.plusDays(1))
        else if (lower.contains("last week")) Some(today.minusWeeks(1))
        else if (lower.contains("today")) Some(today)
        else None
      }
  }

  /** [[extractDates]] with the relative-month and relative-day layers: a
    * relative phrase resolves to its exact (year, month) against the
    * clock and WINS over the bare-name explicit path — "last march" must
    * not fall through to explicit month=03 with the default year 2020.
    * Day-level phrases are the most specific, so they win over
    * month-level ("yesterday" on 2026-08-01 → 2026-07, whatever else the
    * question mentions). Questions with no relative phrase take the
    * explicit/defaults path unchanged. */
  def extractDatesNlp(q: String, today: java.time.LocalDate): (List[String], List[String]) =
    extractDayNlp(q, today).map(d => (d.getYear, d.getMonthValue))
      .orElse(extractYearMonthNlp(q, today)) match {
      case Some((y, m)) => (List(y.toString), List(f"$m%02d"))
      case None => extractDates(q)
    }

  // ---- numeric comparisons -------------------------------------------

  case class NumericFilter(column: String, op: String, value: Double)

  private val MoreThanRx = raw"(?i)(?:more than|greater than|over|above)\s+[$$]?([\d,]+(?:\.\d+)?)".r
  private val LessThanRx = raw"(?i)(?:less than|under|below)\s+[$$]?([\d,]+(?:\.\d+)?)".r
  private val AtLeastRx = raw"(?i)at least\s+[$$]?([\d,]+(?:\.\d+)?)".r

  /** Comparison phrases ("more than $5,000,000") → operator + value for a
    * caller-chosen metric column. */
  def extractComparison(q: String, column: String): Option[NumericFilter] = {
    def num(s: String): Double = s.replace(",", "").toDouble
    MoreThanRx.findFirstMatchIn(q).map(m => NumericFilter(column, ">", num(m.group(1))))
      .orElse(LessThanRx.findFirstMatchIn(q).map(m => NumericFilter(column, "<", num(m.group(1)))))
      .orElse(AtLeastRx.findFirstMatchIn(q).map(m => NumericFilter(column, ">=", num(m.group(1)))))
  }

  // ---- entities -------------------------------------------------------

  /** US states: name ↔ 2-letter abbreviation (engine analog of the
    * reference's `us.states.lookup`). */
  val UsStates: Map[String, String] = Map(
    "alabama" -> "AL", "alaska" -> "AK", "arizona" -> "AZ", "arkansas" -> "AR",
    "california" -> "CA", "colorado" -> "CO", "connecticut" -> "CT",
    "delaware" -> "DE", "florida" -> "FL", "georgia" -> "GA", "hawaii" -> "HI",
    "idaho" -> "ID", "illinois" -> "IL", "indiana" -> "IN", "iowa" -> "IA",
    "kansas" -> "KS", "kentucky" -> "KY", "louisiana" -> "LA", "maine" -> "ME",
    "maryland" -> "MD", "massachusetts" -> "MA", "michigan" -> "MI",
    "minnesota" -> "MN", "mississippi" -> "MS", "missouri" -> "MO",
    "montana" -> "MT", "nebraska" -> "NE", "nevada" -> "NV",
    "new hampshire" -> "NH", "new jersey" -> "NJ", "new mexico" -> "NM",
    "new york" -> "NY", "north carolina" -> "NC", "north dakota" -> "ND",
    "ohio" -> "OH", "oklahoma" -> "OK", "oregon" -> "OR",
    "pennsylvania" -> "PA", "rhode island" -> "RI", "south carolina" -> "SC",
    "south dakota" -> "SD", "tennessee" -> "TN", "texas" -> "TX",
    "utah" -> "UT", "vermont" -> "VT", "virginia" -> "VA",
    "washington" -> "WA", "west virginia" -> "WV", "wisconsin" -> "WI",
    "wyoming" -> "WY")

  // Longest name first with word-boundary anchors: bare `contains` over an
  // unordered Map made "Arkansas" nondeterministically resolve to KS (the
  // substring "kansas") and "West Virginia" to VA. Boundaries reject
  // mid-word substrings; length order makes two-word states beat their
  // one-word suffixes.
  private val StatePatterns: List[(scala.util.matching.Regex, String)] =
    UsStates.toList.sortBy { case (name, _) => (-name.length, name) }
      .map { case (name, abbr) =>
        (raw"\b${java.util.regex.Pattern.quote(name)}\b".r, abbr) }

  /** First state mentioned in the question, by name or bare abbreviation;
    * longest full name wins, matched on word boundaries. */
  def extractState(q: String): Option[String] = {
    val lower = q.toLowerCase
    StatePatterns.collectFirst {
      case (rx, abbr) if rx.findFirstIn(lower).isDefined => abbr }
      .orElse {
        val abbrs = UsStates.values.toSet
        raw"\b([A-Z]{2})\b".r.findAllMatchIn(q).map(_.group(1)).find(abbrs.contains)
      }
  }

  /** FEMA incident-type whitelist (`Disaster dollar/client.py:41-45`). */
  val IncidentTypes: List[String] = List(
    "Hurricane", "Severe Storm", "Fire", "Typhoon", "Earthquake",
    "Severe Ice Storm", "Flood", "Dam or Levee Break", "Dam/Levee Break",
    "Snowstorm", "Tornado", "Tsunami", "Coastal Storm", "Mud/Landslide",
    "Freezing", "Other", "Volcanic Eruption", "Winter Storm",
    "Tropical Storm", "Straight-Line Winds")

  /** Lemma-ish match: singular/plural + lowercase containment (the spaCy
    * lemma whitelist match, reduced to what the corpus needs). */
  def extractIncidentType(q: String): Option[String] = {
    val lower = q.toLowerCase
    IncidentTypes.find { t =>
      val l = t.toLowerCase
      lower.contains(l) || lower.contains(l + "s") ||
        l.split(" ").forall(w => lower.contains(w) || lower.contains(w + "s"))
    }
  }

  /** NOAA disaster keyword → wide-column prefix, in the reference's exact
    * insertion order (`Billion_Dollar/new_disaster_c.py:19-34`
    * DISASTER_COLUMN_MAPPING — Python dicts preserve it). `None` marks the
    * reference's explicit "earthquake is not in the schema" entry. */
  val NoaaKeywordMap: List[(String, Option[String])] = List(
    "earthquake" -> None,
    "flood" -> Some("Flooding"), "flooding" -> Some("Flooding"),
    "freeze" -> Some("Freeze"),
    "severe storm" -> Some("Severe Storm"), "storm" -> Some("Severe Storm"),
    "tropical cyclone" -> Some("Tropical Cyclone"),
    "hurricane" -> Some("Tropical Cyclone"), "cyclone" -> Some("Tropical Cyclone"),
    "wildfire" -> Some("Wildfire"), "fire" -> Some("Wildfire"),
    "winter storm" -> Some("Winter Storm"), "snow" -> Some("Winter Storm"),
    "drought" -> Some("Drought"))

  /** Exact reference parity: iterate the ordered map, stop on the FIRST
    * contained keyword (`new_disaster_c.py:45-49`) — including the quirk
    * that a "winter storm" question hits "storm" first and yields
    * Severe Storm, and that "earthquake" matches with no column. Returns
    * (matched keyword, mapped column). */
  def noaaFirstDisaster(q: String): Option[(String, Option[String])] = {
    val lower = q.toLowerCase
    NoaaKeywordMap.collectFirst { case (k, v) if lower.contains(k) => (k, v) }
  }

  /** Multi-type extraction — a DELIBERATE engine extension beyond the
    * reference (which stops at the first keyword; see [[noaaFirstDisaster]]
    * for exact parity): compare-style questions ("flooding and tropical
    * cyclone costs") need every mentioned type. Scans in reference key
    * order; a keyword that is a substring of another matched keyword is
    * suppressed, so "winter storm" resolves to Winter Storm here rather
    * than the reference's first-hit Severe Storm. */
  def noaaDisasterTypes(q: String): List[String] = {
    val lower = q.toLowerCase
    val hits = NoaaKeywordMap.filter { case (k, _) => lower.contains(k) }
    hits.filterNot { case (k, _) =>
      hits.exists { case (k2, _) => k2 != k && k2.contains(k) } }
      .flatMap(_._2).distinct
  }

  /** Metric detection against a registry of (canonical name, aliases):
    * exact substring first, then fuzzy token match above `cutoff` using
    * [[Similarity.ratio]] (difflib-parity). */
  def detectMetrics(q: String, registry: Seq[(String, Seq[String])],
                    cutoff: Double = 0.8): List[String] = {
    val lower = q.toLowerCase
    val exact = registry.collect {
      case (name, aliases) if (name +: aliases).exists(a => lower.contains(a.toLowerCase)) => name
    }
    if (exact.nonEmpty) exact.toList.distinct
    else {
      val tokens = raw"\b[\w-]+\b".r.findAllIn(lower).toList
      registry.collect {
        case (name, aliases) if (name +: aliases).exists(a =>
          tokens.exists(t => Similarity.ratio(t, a.toLowerCase) >= cutoff)) => name
      }.toList.distinct
    }
  }

  /** Candidate entity n-grams: word sequences minus stopwords (the ERA5
    * city-candidate generator, `era5client.py:92-101`). */
  private val Stopwords = Set(
    "what", "was", "the", "in", "of", "and", "for", "to", "a", "an", "is",
    "how", "much", "many", "compare", "between", "show", "me", "on", "at",
    "versus", "vs", "with", "by", "from", "were", "did", "do", "does")

  def entityCandidates(q: String, maxLen: Int = 2): List[String] = {
    val words = raw"\b[A-Za-z]+\b".r.findAllIn(q).toList
      .filterNot(w => Stopwords.contains(w.toLowerCase) || w.forall(_.isDigit))
    val grams = for {
      n <- 1 to maxLen
      i <- 0 to words.length - n
    } yield words.slice(i, i + n).mkString(" ")
    grams.toList.distinct
  }

  /** Top-1 fuzzy resolution of candidates against a dimension (difflib
    * `get_close_matches(n=1, cutoff)` behavior: best ratio wins, None
    * below cutoff; ties break to the earlier dimension value). */
  def fuzzyResolve(cand: String, dim: Seq[String], cutoff: Double): Option[String] =
    dim.map(d => d -> Similarity.ratio(cand.toLowerCase, d.toLowerCase))
      .filter(_._2 >= cutoff)
      .sortBy { case (d, r) => (-r, dim.indexOf(d)) }
      .headOption.map(_._1)
}
