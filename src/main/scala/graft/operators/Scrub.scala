package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for web-scale text pipelines: detect-and-redact of the
 * three classic machine-findable identifier classes (emails, phone
 * numbers, IPv4 addresses), as practiced by public corpus-cleaning
 * recipes. Patterns are deliberately conservative and RE2-compatible
 * so the DuckDB oracle runs the very same regexes; real deployments
 * layer NER on top — this is the deterministic regex tier.
 *
 * Scan-side codegen'd `regexp_replace`/`regexp_extract_all` only — no
 * shuffle, linear scaling.
 */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def emailCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(EmailRe), lit(0)))
  def phoneCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(PhoneRe), lit(0)))
  def ipCount(text: Column): Column =
    size(call_function("regexp_extract_all", text, lit(Ipv4Re), lit(0)))

  /** Redaction order is fixed (email, then IP, then phone) so engines
    * agree: a phone-shaped digit run inside an email/IP is already
    * gone when the phone pass runs. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
}
