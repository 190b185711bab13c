package graft.answer

import org.apache.spark.sql.Row

import graft.model.Domain

/** Row → answer-text formatting (SURVEY F13/F19, W4): currency strings,
  * unit annotation from the metric registry, per-row rendering — the
  * reference's client-side formatting layer without the tuple-text
  * parsing (rows are structured end-to-end in Spark, so F14 disappears).
  */
object Format {

  /** Round like Python's f-string formatting (HALF_EVEN on the exact
    * binary value) — Java's %.Nf rounds HALF_UP, which diverges from the
    * reference on exact halves (38.25 → "$38.3" instead of "$38.2"). */
  private def py(v: Double, scale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(v).setScale(scale, java.math.RoundingMode.HALF_EVEN)

  /** `$X.X billion` — NOAA cost formatting (`new_disaster_c.py:313-317`,
    * costs stored in billions). */
  def billions(v: Double): String = s"$$${py(v, 1)} billion"

  /** `$1,234,567.00` — FEMA dollar metrics. */
  def dollars(v: Double): String = {
    val nf = java.text.NumberFormat.getNumberInstance(java.util.Locale.US)
    nf.setMinimumFractionDigits(2)
    nf.setMaximumFractionDigits(2)
    s"$$${nf.format(py(v, 2))}"
  }

  /** value + unit from the metric registry ("5.8 m/s", "306.4 K"). */
  def withUnit(metric: String, v: Double): String = {
    val u = Domain.unitOf(metric)
    if (u.isEmpty) v.toString else s"$v $u"
  }

  /** Render rows as the `col=value` lines the reference feeds its LLM
    * prompt, capped like the prompt-size guard (`client.py:248`). */
  def renderRows(rows: Seq[Row], maxRows: Int = 25): String =
    rows.take(maxRows).map { r =>
      r.schema.fieldNames.zipWithIndex
        .map { case (f, i) => s"$f=${r.get(i)}" }.mkString(", ")
    }.mkString("\n")
}

/** External LLM boundary as an interface with a deterministic stub — the
  * reference POSTs rows+question to a chat-completions API
  * (`era5client.py:304-324`); this environment has zero egress, so the
  * engine ships the seam, not the call. */
trait LlmClient {
  def answer(question: String, context: String): String

  /** Second-pass readability rewrite of a drafted answer — the NOAA
    * client's `improved_answer` stage (`Billion_Dollar/
    * new_disaster_c.py:93-127`): a follow-up LLM call instructed to
    * preserve every fact and only improve wording. Defaults to the
    * identity (the only fact-preserving deterministic stub). */
  def rewrite(question: String, draft: String): String = draft
}

/** Deterministic echo stub: answer = context summary, rewrite = identity
  * (what tests pin). */
object EchoLlm extends LlmClient {
  def answer(question: String, context: String): String =
    s"Q: $question\n$context"
}
