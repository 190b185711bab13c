package graft.engine

/** City-validation fallback seam — the engine analog of the reference's
  * live Nominatim lookup when a question's city candidate is neither an
  * exact nor a fuzzy match against the dataset's City dimension
  * (`ERA5_Monthly_Means/era5client.py:147-157`: geopy `geocode(candidate)`
  * validated as city/town/village, then the candidate is accepted).
  *
  * This environment has zero egress, so — like [[graft.answer.LlmClient]]
  * — the engine ships the seam, not the call: production wires a real
  * geocoding client; tests wire [[FixtureGeocoder]].
  */
trait Geocoder {

  /** `Some(normalizedCityName)` when `candidate` names a real
    * city/town/village (possibly normalizing an alias, e.g.
    * "bombay" → "Mumbai"); `None` otherwise. */
  def lookupCity(candidate: String): Option[String]
}

/** Default: no external lookup — unresolved candidates stay unresolved
  * (the engine then runs city-unfiltered, the reference's own behavior
  * when every candidate fails validation). */
object NullGeocoder extends Geocoder {
  def lookupCity(candidate: String): Option[String] = None
}

/** Deterministic fixture-backed stub: a lowercase alias → canonical-name
  * map standing in for the live geocoder (what tests pin). */
class FixtureGeocoder(entries: Map[String, String]) extends Geocoder {
  private val norm = entries.map { case (k, v) => k.trim.toLowerCase -> v }
  def lookupCity(candidate: String): Option[String] =
    norm.get(candidate.trim.toLowerCase)
}
