package graft.text

/** Unicode normalization for curation (the C4-style mojibake/control
  * cleanup): removal of C0 control characters EXCEPT tab and newline —
  * the class `[\x00-\x08\x0B-\x1F\x7F]`, which also folds CRLF to LF
  * (\r is \x0D) — followed by NFC composition (decomposed accents,
  * compatibility sequences from sloppy extractors). Order is
  * contractual and strip-FIRST on purpose: a stray control byte
  * between a base character and its combining mark would otherwise
  * block composition, leaving non-NFC output and breaking idempotence
  * (clean∘clean ≡ clean is property-tested). Both steps are mirrored
  * verbatim in the q87 oracle (the same RE2 class + `nfc_normalize`).
  */
object Normalize {

  val ControlRe = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"

  private val control = java.util.regex.Pattern.compile(ControlRe)

  def clean(text: String): String =
    java.text.Normalizer.normalize(
      control.matcher(text).replaceAll(""),
      java.text.Normalizer.Form.NFC)
}
