package graft.rdf

import scala.collection.mutable

import graft.model.EntityMention
import graft.util.PyStr

/** Document-protagonist selection: the entity the page is "about".
  *
  * Our engine's deterministic stand-in for what the reference's LLM coref
  * (rdfify_improved.py:71-151) effectively resolved personal pronouns to on
  * biography-style pages. The chain:
  *   1. entity whose URI tail equals the document title (normalized);
  *   2. entity whose URI tail contains / is contained in the title;
  *   3. none — personal pronouns then fall through to the reference's
  *      deterministic chain, which picks the first person-like mention
  *      (measured better than a most-frequent-URI fallback: the page
  *      subject often has no linked URI at all, and any frequency winner
  *      is then some other entity).
  */
object Protagonist {

  /** Keep letters/digits (incl. accented BMP letters), drop punctuation. */
  def norm(s: String): String =
    PyStr.lower(s).replaceAll("[^0-9a-zA-Z\\u00C0-\\uFFFF]", "")

  def uriTail(uri: String): String = uri.substring(uri.lastIndexOf('/') + 1)

  /** Title of a document id/url: the last path segment. */
  def titleOf(docId: String): String = {
    val noFrag = docId.stripSuffix("/")
    noFrag.substring(noFrag.lastIndexOf('/') + 1)
  }

  def select(entities: Seq[EntityMention], title: String): Option[String] = {
    val tn = norm(title)
    val exact = entities.collectFirst {
      case e if e.uri.startsWith("http") && norm(uriTail(e.uri)) == tn => e.uri
    }
    if (exact.isDefined) return exact
    entities.collectFirst {
      case e
          if e.uri.startsWith("http") && {
            val t2 = norm(uriTail(e.uri))
            t2.nonEmpty && (t2.contains(tn) || tn.contains(t2))
          } =>
        e.uri
    }
  }
}
