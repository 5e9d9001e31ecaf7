package graft.link

import scala.collection.mutable
import scala.io.Source

import graft.util.PyStr

/** Broadcast-style alias dictionary: lowercased mention surface →
  * (entity, uri, confidence). Built from the reference's golden entity
  * links (FIXTURES.md §3), last-write-wins per mention to mirror the
  * reference's index build (rdfify_improved.py:295-302). Ships on the
  * classpath, so every executor loads it once per JVM — no network, no
  * shuffle, equivalent to a broadcast variable for a dictionary this size.
  */
final case class AliasEntry(mention: String, entity: String, uri: String, confidence: Double)

final class AliasDict private (val entries: Map[String, AliasEntry]) extends Serializable {

  /** token-trie over lowercased alias token sequences for longest-match
    * scan. Tokens are normalized like the linker's chunk tokenizer
    * (trailing periods/hyphens/apostrophes stripped) so dotted-initial
    * mentions like "F. Scott Fitzgerald" match.
    */
  @transient lazy val trie: AliasDict.TrieNode = {
    val root = new AliasDict.TrieNode
    entries.foreach { case (k, e) =>
      var node = root
      PyStr.split(k).foreach { tok =>
        node = node.children.getOrElseUpdate(
          AliasDict.normToken(tok), new AliasDict.TrieNode)
      }
      node.entry = Some(e)
    }
    root
  }

  def lookup(mentionLower: String): Option[AliasEntry] = entries.get(mentionLower)
  def size: Int = entries.size
}

object AliasDict {

  /** Strip trailing '.', '-', ''' — the same trim the chunk tokenizer
    * applies — so dict tokens and text tokens meet in one space.
    */
  def normToken(t: String): String = {
    var end = t.length
    while (end > 0 && {
      val c = t.charAt(end - 1)
      c == '.' || c == '-' || c == '\'' || c == '’'
    }) end -= 1
    if (end == t.length) t else t.substring(0, end)
  }

  final class TrieNode {
    val children: mutable.HashMap[String, TrieNode] = mutable.HashMap.empty
    var entry: Option[AliasEntry] = None
  }

  /** JVM-wide singleton loaded from the bundled resource. */
  lazy val default: AliasDict = fromResource("/graft/alias_dict.tsv")

  def fromResource(path: String): AliasDict = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    val src = Source.fromInputStream(in)(scala.io.Codec.UTF8)
    try fromLines(src.getLines())
    finally src.close()
  }

  def fromLines(lines: Iterator[String]): AliasDict = {
    val m = mutable.LinkedHashMap.empty[String, AliasEntry]
    lines.foreach { l =>
      val parts = l.split('\t')
      if (parts.length >= 4) {
        val e = AliasEntry(parts(0), parts(1), parts(2), parts(3).toDouble)
        m.update(PyStr.lower(e.mention), e)
      }
    }
    new AliasDict(m.toMap)
  }

  def fromEntries(es: Seq[AliasEntry]): AliasDict = {
    val m = mutable.LinkedHashMap.empty[String, AliasEntry]
    es.foreach(e => m.update(PyStr.lower(e.mention), e))
    new AliasDict(m.toMap)
  }
}
