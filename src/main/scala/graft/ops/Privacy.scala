package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails, phone
  * numbers and IPv4 addresses found by regex and replaced with stable
  * placeholder tokens. Pure codegen'd SQL functions (`regexp_replace` /
  * `regexp_count`) — map-only, no shuffle, linear at any corpus size.
  *
  * The patterns deliberately avoid lookaround so the exact same regex runs
  * under Java's engine (Spark) and RE2 (DuckDB/the oracle): character
  * classes, bounded repetition and ASCII word boundaries only. */
object Privacy {

  /** Order matters and is part of the contract: emails first (their local
    * part may contain digit runs), then IPv4 (dotted digits), then phones
    * (dashed/spaced digits) — the three pattern families are disjoint on
    * the residual text, so the chain is confluent. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Text with every email/IPv4/phone replaced by `[EMAIL]`/`[IP]`/`[PHONE]`. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("[EMAIL]")),
        lit(Ipv4Re), lit("[IP]")),
      lit(PhoneRe), lit("[PHONE]"))

  /** Per-kind PII hit counts over the ORIGINAL text (pre-redaction). */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EmailRe)),
    "n_ip" -> regexp_count(text, lit(Ipv4Re)),
    "n_phone" -> regexp_count(text, lit(PhoneRe)))
}
