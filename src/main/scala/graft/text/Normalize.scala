package graft.text

/** Unicode normalization for curation (the C4-style mojibake/control
  * cleanup): NFC composition (decomposed accents, compatibility
  * sequences from sloppy extractors) followed by removal of C0 control
  * characters EXCEPT tab and newline — the class
  * `[\x00-\x08\x0B-\x1F\x7F]`, which also folds CRLF to LF (\r is
  * \x0D). Order is contractual (normalize, then strip) and both steps
  * are mirrored verbatim in the q87 oracle (`nfc_normalize` +
  * the same RE2 class).
  */
object Normalize {

  val ControlRe = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"

  private val control = java.util.regex.Pattern.compile(ControlRe)

  def clean(text: String): String = {
    val n = java.text.Normalizer.normalize(
      text, java.text.Normalizer.Form.NFC)
    control.matcher(n).replaceAll("")
  }
}
