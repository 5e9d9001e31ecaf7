package graft.text

/** F3: sentence-boundary truncation — port of
  * data_collection/reduce_author_contents.py:12-32. Cuts at the last
  * `.`/`!`/`?` inside the limit when that boundary lies past 80% of it,
  * else hard-cuts to (max−3) chars plus an ASCII ellipsis.
  */
object Truncate {

  def toSentenceBoundary(text: String, maxChars: Int = 2000): String = {
    if (text.length <= maxChars) return text
    val truncated = text.substring(0, maxChars)
    val lastSentenceEnd = math.max(
      truncated.lastIndexOf('.'),
      math.max(truncated.lastIndexOf('!'), truncated.lastIndexOf('?')))
    if (lastSentenceEnd > maxChars * 0.8) text.substring(0, lastSentenceEnd + 1)
    else text.substring(0, maxChars - 3) + "..."
  }
}
