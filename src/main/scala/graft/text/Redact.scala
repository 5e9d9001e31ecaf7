package graft.text

/** PII redaction for training-data curation (the C4/Dolma-style scrub
  * step): emails, IPv4 addresses, and phone-shaped digit runs are
  * replaced with typed mask tokens, with per-kind counts for curation
  * accounting. Deterministic, map-only, and deliberately restricted to
  * RE2-compatible regex (no backrefs/lookaround) so the DuckDB oracle
  * can run the IDENTICAL patterns — the q74 gate is value-level on
  * both the counts and an md5 of the redacted text.
  *
  * Application order matters and is part of the contract: emails
  * first (their digits must not be half-eaten by the phone pattern),
  * then IPs, then phones; counts are taken on the text as it existed
  * when that pattern ran.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d\\s().-]{7,}\\d"

  private val email = EmailRe.r
  private val ipv4 = Ipv4Re.r
  private val phone = PhoneRe.r

  final case class Redacted(
      clean: String, n_emails: Int, n_ips: Int, n_phones: Int)

  def redact(text: String): Redacted = {
    val nE = email.findAllIn(text).size
    val t1 = email.replaceAllIn(text, "<EMAIL>")
    val nI = ipv4.findAllIn(t1).size
    val t2 = ipv4.replaceAllIn(t1, "<IP>")
    val nP = phone.findAllIn(t2).size
    val t3 = phone.replaceAllIn(t2, "<PHONE>")
    Redacted(t3, nE, nI, nP)
  }
}
