package graft.extract

import java.util.regex.Pattern

import scala.collection.mutable

import graft.util.PyStr

/** Deterministic HTML → main-text extraction.
  *
  * Re-specifies the reference scraper's extraction semantics
  * (data_collection/wikipedia_scraper.py:77-153) for the engine's
  * `html binary` input column:
  *
  *  1. drop h2/h3/h4 headings whose text matches an unwanted-section name
  *     (case-insensitive substring). NOTE the reference's sibling-walk loop
  *     (wikipedia_scraper.py:94-101) never executes — `current` starts as
  *     the heading itself so the while condition is immediately false — so
  *     only the heading element is removed, not the section body. Mirrored.
  *  2. drop table/div with class matching infobox|navbox|sidebar;
  *  3. drop ol/ul with class matching references|citations;
  *  4. drop span/a with class matching edit|mw-editsection;
  *  5. take div.mw-parser-output (else body, else whole doc) text with
  *     BeautifulSoup `get_text(separator=' ', strip=True)` semantics:
  *     strip each text node, drop empties, join with single spaces;
  *  6. apply the ordered clean_text regex chain
  *     (wikipedia_scraper.py:127-153).
  */
object HtmlText {

  private val unwantedSections = List(
    "References", "Bibliography", "Further reading", "External links",
    "See also", "Notes", "Citations", "Sources", "Works cited",
    "Selected works", "Awards and honors", "Honors", "Legacy",
    "Personal life", "Death", "Family", "Early life", "Education")

  private val unwantedSectionPatterns =
    unwantedSections.map(s => Pattern.compile(Pattern.quote(s), Pattern.CASE_INSENSITIVE))

  private val infoboxClass = Pattern.compile("infobox|navbox|sidebar", Pattern.CASE_INSENSITIVE)
  private val referencesClass = Pattern.compile("references|citations", Pattern.CASE_INSENSITIVE)
  private val editClass = Pattern.compile("edit|mw-editsection", Pattern.CASE_INSENSITIVE)

  // ------------------------------------------------------------------
  // Minimal DOM
  // ------------------------------------------------------------------

  sealed private trait Node
  final private case class Text(value: String) extends Node
  final private class Elem(
      val name: String,
      val classes: Vector[String],
      val children: mutable.ArrayBuffer[Node] = mutable.ArrayBuffer.empty)
      extends Node {
    var removed: Boolean = false
  }

  private val voidTags = Set("br", "hr", "img", "meta", "link", "input", "area",
    "base", "col", "embed", "source", "track", "wbr")

  private val classAttr = Pattern.compile(
    "class\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))",
    Pattern.CASE_INSENSITIVE)

  /** Parse a (well-formed-ish) HTML string into a DOM-lite tree. */
  private def parse(html: String): Elem = {
    val root = new Elem("#root", Vector.empty)
    val stack = mutable.Stack[Elem](root)
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) stack.top.children += Text(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i) stack.top.children += Text(decodeEntities(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && html.charAt(lt + 1) == '!') {
          val end = html.indexOf('>', lt)
          i = if (end < 0) n else end + 1
        } else {
          val gt = html.indexOf('>', lt)
          if (gt < 0) { i = n }
          else {
            val raw = html.substring(lt + 1, gt)
            if (raw.startsWith("/")) {
              val name = PyStr.lower(raw.substring(1).trim)
              // pop to matching open tag if present
              if (stack.exists(e => e.name == name)) {
                while (stack.top.name != name) stack.pop()
                if (stack.size > 1) stack.pop()
              }
            } else {
              val selfClosing = raw.endsWith("/")
              val body = if (selfClosing) raw.dropRight(1) else raw
              val sp = body.indexWhere(Character.isWhitespace)
              val name = PyStr.lower(if (sp < 0) body else body.substring(0, sp))
              val classes = {
                val m = classAttr.matcher(body)
                if (m.find()) {
                  val v = Option(m.group(2)).orElse(Option(m.group(3)))
                    .getOrElse(Option(m.group(4)).getOrElse(""))
                  PyStr.split(v)
                } else Vector.empty
              }
              val el = new Elem(name, classes)
              stack.top.children += el
              if (!selfClosing && !voidTags(name)) stack.push(el)
              if (name == "script" || name == "style") {
                // raw text elements: consume until closing tag
                // (case-insensitive scan, no full-document lowercase)
                val close = "</" + name
                var end = -1
                var k = gt + 1
                val limit = n - close.length
                while (end < 0 && k <= limit) {
                  if (html.regionMatches(true, k, close, 0, close.length)) end = k
                  else k += 1
                }
                if (end >= 0) {
                  val gt2 = html.indexOf('>', end)
                  i = if (gt2 < 0) n else gt2 + 1
                  if (stack.top eq el) stack.pop()
                  el.children.clear() // scripts contribute no text
                } else i = n
              }
            }
            if (i <= gt) i = gt + 1
          }
        }
      }
    }
    root
  }

  private def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", "\u00a0")

  private def walk(e: Elem)(f: Elem => Unit): Unit = {
    f(e)
    e.children.foreach {
      case c: Elem => walk(c)(f)
      case _ =>
    }
  }

  /** Direct text content if the element has exactly one text child —
    * BeautifulSoup's `.string` contract used by the heading matcher.
    */
  private def soloString(e: Elem): Option[String] = {
    val kids = e.children.toVector
    kids match {
      case Vector(Text(t)) => Some(t)
      case Vector(inner: Elem) => soloString(inner)
      case _ => None
    }
  }

  private def getText(e: Elem, out: mutable.ArrayBuffer[String]): Unit = {
    if (e.removed) return
    e.children.foreach {
      case Text(t) =>
        val s = PyStr.strip(t)
        if (s.nonEmpty) out += s
      case c: Elem => getText(c, out)
    }
  }

  // ------------------------------------------------------------------
  // Extraction
  // ------------------------------------------------------------------

  def extract(html: String): String = {
    val root = parse(html)

    walk(root) { e =>
      val classStr = e.classes
      def classMatches(p: Pattern) = classStr.exists(c => p.matcher(c).find())
      e.name match {
        case "h2" | "h3" | "h4" =>
          soloString(e).foreach { s =>
            if (unwantedSectionPatterns.exists(_.matcher(s).find())) e.removed = true
          }
        case "table" | "div" if classMatches(infoboxClass) => e.removed = true
        case "ol" | "ul" if classMatches(referencesClass) => e.removed = true
        case "span" | "a" if classMatches(editClass) => e.removed = true
        case _ =>
      }
    }

    var main: Option[Elem] = None
    walk(root) { e =>
      if (main.isEmpty && e.name == "div" && e.classes.contains("mw-parser-output"))
        main = Some(e)
    }
    if (main.isEmpty) walk(root) { e =>
      if (main.isEmpty && e.name == "body") main = Some(e)
    }
    val content = main.getOrElse(root)
    val parts = mutable.ArrayBuffer.empty[String]
    getText(content, parts)
    cleanText(parts.mkString(" "))
  }

  /** wikipedia_scraper.py:127-153 — ordered regex cleanup chain.
    * Patterns are compiled once (this runs per document in the hot path).
    */
  private val cleanChain: Array[(Pattern, String)] = {
    def p(s: String, flags: Int = 0) =
      Pattern.compile(s, flags | Pattern.UNICODE_CHARACTER_CLASS)
    Array(
      p("\\[\\s*\\d+\\s*\\]") -> "",
      p("\\[edit\\]") -> "",
      p("\\[citation needed\\]") -> "",
      p("\\[when\\?\\]") -> "",
      p("\\[where\\?\\]") -> "",
      p("\\[note\\s+\\d+\\]") -> "",
      p("\\[[a-z]\\]") -> "",
      p("\\[[A-Z]\\]") -> "",
      p("\\[[a-z]\\s*\\]") -> "",
      p("\\[[A-Z]\\s*\\]") -> "",
      p("===\\s*(.*?)\\s*===") -> "$1.",
      p("==\\s*(.*?)\\s*==") -> "\n\n$1\n",
      p("\\s+") -> " ",
      p("\\n{3,}") -> "\n\n",
      p("^\\s+|\\s+$", Pattern.MULTILINE) -> "")
  }

  def cleanText(text0: String): String = {
    if (text0.isEmpty) return ""
    var t = text0
    var i = 0
    while (i < cleanChain.length) {
      // guards: patterns 0-9 need '[', 10-11 need "==" — skip scans that
      // cannot match (same output, far fewer Matcher allocations per doc)
      val applicable =
        if (i <= 9) t.indexOf('[') >= 0
        else if (i <= 11) t.indexOf("==") >= 0
        else true
      if (applicable) {
        val (pat, rep) = cleanChain(i)
        t = pat.matcher(t).replaceAll(rep)
      }
      i += 1
    }
    PyStr.strip(t)
  }
}
