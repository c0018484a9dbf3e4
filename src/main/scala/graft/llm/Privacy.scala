package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect-and-redact emails, IPv4
  * addresses, and phone-like numbers with typed placeholder tokens, plus
  * per-document match counts so a cleaning campaign can audit redaction
  * volume by source.
  *
  * Scale shape: one narrow projection over the scan — `regexp_count` /
  * `regexp_replace` are codegen'd builtins, so the whole operator is a
  * single whole-stage-codegen pass with no shuffle, embarrassingly parallel
  * at any corpus size. The regex syntax is kept to the subset that
  * java.util.regex and RE2 interpret identically (no backrefs, no
  * lookaround) so the same patterns run under Spark and the DuckDB oracle.
  */
object Privacy {

  /** Email addresses — the RFC-ish practical pattern. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded so version strings like 1.2.3.4.5 still
    * match their leading quad, same as RE2). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style subscriber fragment (555-0100 exchange test range). */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Per-doc scrub: counts per PII class + the redacted text. Replacement
    * is sequential (email → IP → phone) and each class is COUNTED on the
    * text the previous passes already redacted, so the counts are exactly
    * the placeholder tokens emitted — an IP nested inside an email (e.g. a
    * dotted-quad domain) is consumed by the email pass and never
    * double-counted as an unredacted IP.
    */
  def scrub(docs: DataFrame): DataFrame = {
    val afterEmail = regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>"))
    val afterIp = regexp_replace(afterEmail, lit(Ipv4Re), lit("<IP>"))
    val afterPhone = regexp_replace(afterIp, lit(PhoneRe), lit("<PHONE>"))
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(afterIp, lit(PhoneRe)).cast("long").as("n_phones"),
      afterPhone.as("scrubbed"))
  }
}
