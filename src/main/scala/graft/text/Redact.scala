package graft.text

/** PII redaction for training-data curation (the C4/Dolma-style scrub
  * step): emails, IPv4 addresses, and phone-shaped digit runs are
  * replaced with typed mask tokens, with per-kind counts for curation
  * accounting. Deterministic, map-only, and deliberately restricted to
  * regex constructs Java and RE2 interpret IDENTICALLY — no
  * backrefs/lookaround, and no shorthand classes whose definitions
  * differ between the engines (Java's \s includes \x0B where RE2's
  * does not, so the phone class spells its whitespace out explicitly)
  * — so the DuckDB oracle runs the same pattern strings verbatim and
  * the q74 gate is value-level on both the counts and an md5 of the
  * redacted text.
  *
  * Application order matters and is part of the contract: emails
  * first (their digits must not be half-eaten by the phone pattern),
  * then IPs, then phones; counts are taken on the text as it existed
  * when that pattern ran. Each pattern is applied in ONE pass
  * (count + mask together), not a count scan plus a replace scan.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Octets are range-checked (0-255) so version-like strings embedded
    * in prose ("10.2.300.4") and junk like "999.999.999.999" are NOT
    * masked; the alternation is ordered longest-first so RE2's and
    * Java's leftmost-first matching agree, and \b on both ends stops
    * partial masks inside longer digit runs.
    */
  val Ipv4Re =
    "\\b((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}" +
      "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\b"

  /** The run is bounded ({7,20}, so 9-22 chars total) and the inner
    * class contains NO line terminators (\n, \f, \r) — a digit table
    * or version list spanning multiple lines can no longer collapse
    * into one <PHONE> mask. \x0B stays because it is the one
    * horizontal-ish whitespace Java's \s has and RE2's does not, and
    * spelling the class out keeps the two engines identical.
    */
  val PhoneRe = "\\+?\\d[\\d \\t\\x0B().-]{7,20}\\d"

  private val email = java.util.regex.Pattern.compile(EmailRe)
  private val ipv4 = java.util.regex.Pattern.compile(Ipv4Re)
  private val phone = java.util.regex.Pattern.compile(PhoneRe)

  final case class Redacted(
      clean: String, n_emails: Int, n_ips: Int, n_phones: Int)

  /** One pass: mask every match and return (masked text, match count).
    * Mask strings contain no `$`/`\`, so appendReplacement is literal.
    */
  private def maskCount(
      text: String, p: java.util.regex.Pattern, mask: String): (String, Int) = {
    val m = p.matcher(text)
    val sb = new java.lang.StringBuilder
    var n = 0
    while (m.find()) { n += 1; m.appendReplacement(sb, mask) }
    m.appendTail(sb)
    (sb.toString, n)
  }

  def redact(text: String): Redacted = {
    val (t1, nE) = maskCount(text, email, "<EMAIL>")
    val (t2, nI) = maskCount(t1, ipv4, "<IP>")
    val (t3, nP) = maskCount(t2, phone, "<PHONE>")
    Redacted(t3, nE, nI, nP)
  }
}
