package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * phone numbers, IPv4 addresses. Counts feed corpus audits; `redact`
  * rewrites the text for training-safe output.
  *
  * Patterns stay within the RE2-compatible subset of Java regex (no
  * backreferences, no lookaround) so external engines — and the DuckDB
  * oracle — reproduce matches exactly. Everything is per-row codegen'd
  * expression work: a 100 TB scrub pays one scan and no shuffle.
  */
object Redact {

  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"
  val Ipv4Pattern: String = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Redaction order matters: emails first (their local part may contain
    * digits/dots that the looser patterns could clip), then phones, then
    * IPs. */
  val AllPatterns: Seq[(String, String)] = Seq(
    "email" -> EmailPattern, "phone" -> PhonePattern, "ipv4" -> Ipv4Pattern)

  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def emailCount(text: Column): Column = matchCount(text, EmailPattern)
  def phoneCount(text: Column): Column = matchCount(text, PhonePattern)
  def ipv4Count(text: Column): Column = matchCount(text, Ipv4Pattern)

  /** Replace every PII match with `token`. */
  def redact(text: Column, token: String = "[PII]"): Column =
    AllPatterns.foldLeft(text) { case (t, (_, p)) =>
      regexp_replace(t, p, token)
    }
}
