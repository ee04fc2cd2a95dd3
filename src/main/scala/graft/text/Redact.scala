package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: redact emails, IPv4 addresses
  * and phone-like digit runs, and count what was removed (the C4/Dolma
  * style pre-training cleanup pass).
  *
  * Patterns stay in the ASCII-safe regex subset where Java regex and
  * DuckDB's RE2 agree exactly (no lookaround, no backreferences), so
  * the operator is oracle-checkable. Replacements apply in a fixed
  * order (email, then IPv4, then phone) — later patterns see the
  * earlier masks, which pins the result when categories overlap (an
  * IPv4 inside an email host is masked with the email).
  *
  * Everything is a narrow per-row map: no shuffle, no state — the
  * operator scales linearly and fuses into whole-stage codegen.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  /** Phone-like: 7+ digits allowing separators, e.g. 555-123-4567. */
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  def nEmails(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def nIpv4(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def nPhones(text: Column): Column = size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** The scrubbed text: masks applied in the fixed category order. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<email>"),
        Ipv4Re, "<ip>"),
      PhoneRe, "<phone>")
}
