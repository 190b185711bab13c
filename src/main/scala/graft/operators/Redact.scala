package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction over text columns — the scrubbing pass a training-data
  * pipeline runs before anything leaves the ingest boundary (emails and
  * phone numbers replaced by typed placeholder tokens, with per-document
  * match counts for the audit trail).
  *
  * Patterns are restricted to the Java-regex ∩ RE2 common subset (char
  * classes, counted repeats — no backreferences or lookaround; same
  * rationale as [[TextAnalysis.BpeTokenPattern]]), so the DuckDB oracle
  * replays the redaction byte-for-byte. Redaction is row-local codegen'd
  * `regexp_replace` — zero shuffle at any corpus size.
  */
object Redact {

  /** Email addresses; the mandatory dotted TLD keeps bare `a@b` tokens
    * (never a deliverable address) unredacted. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** E.164-ish `+1-NNN-NNNN` phone numbers (the shape this corpus's
    * synthesized contact lines use; extend per deployment). */
  val PhonePattern = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Applied in declaration order; placeholders contain no `@`, `+`, or
    * digits, so redaction is idempotent and patterns cannot cascade. */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    PhonePattern -> "[PHONE]")

  /** The text with every rule's matches replaced by its placeholder
    * (Spark `regexp_replace` is replace-all, matching DuckDB's 'g'). */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0)))

  /** df with `textCol` redacted in place plus audit columns `n_emails` /
    * `n_phones` (match counts BEFORE redaction). Rejects inputs already
    * carrying the audit columns — withColumn would silently overwrite a
    * previous pass's audit trail (same guard class as AsofJoin's
    * internal-name collision check). */
  def redactDocs(df: DataFrame, textCol: String): DataFrame = {
    val clash = df.columns.toSet.intersect(Set("n_emails", "n_phones"))
    require(clash.isEmpty,
      s"input already has audit column(s) ${clash.mkString(", ")} — " +
        "rename or drop them before re-redacting")
    df.withColumn("n_emails", emailCount(col(textCol)))
      .withColumn("n_phones", phoneCount(col(textCol)))
      .withColumn(textCol, redact(col(textCol)))
  }
}
