package graft.model

/** Stage-boundary record types (SURVEY.md §1.1).
  *
  * Shapes mirror the reference's JSON stage files:
  *  - frames doc: modules/framesrl/framesrl_runner.py:17-28
  *  - entities doc: modules/rel_linker/rel_runner_fixed.py:85-96
  *  - triples: modules/orchestrator/rdfify_improved.py:758-819
  */
final case class FrameElement(name: String, text: String)

final case class Frame(name: String, elements: Vector[FrameElement])

final case class Sentence(index: Int, text: String, frames: Vector[Frame])

final case class FramesDoc(docId: String, sentences: Vector[Sentence])

/** One linked entity mention. NOTE the reference quirk (SURVEY.md §1.1):
  * `end` is the mention *length* as returned by the REL API
  * (rel_runner_fixed.py:80-82); in chunked docs it is chunk-offset+length
  * (rel_runner_fixed.py:133-136). Reproduced as-is for parity.
  */
final case class EntityMention(
    docId: String,
    mention: String,
    entity: String,
    uri: String,
    start: Int,
    end: Int,
    confidence: Double)

/** Entity dict as held in the converter's cumulative context
  * (rdfify_improved.py:339-343): stripped mention + uri + confidence.
  */
final case class CtxEntity(mention: String, uri: String, confidence: Double)

/** Emitted RDF triple. `subj`/`obj` hold either a URI or the literal's
  * lexical form; the flags preserve rdflib's URIRef/Literal distinction.
  * Predicate URI = http://example.org/frame/{frame}#{pred}
  * (rdfify_improved.py:442); custom-TTL short form = {frame}:{pred}
  * (rdfify_improved.py:966-970).
  */
final case class Triple(
    docId: String,
    subj: String,
    subjIsUri: Boolean,
    frame: String,
    role: String,
    pred: String,
    obj: String,
    objIsUri: Boolean) {
  def predUri: String = s"http://example.org/frame/$frame#$pred"
  def predShort: String = s"$frame:$pred"

  /** One line of the custom TTL sink (rdfify_improved.py:961-981). */
  def ttlLine: String = Triple.ttlLine(subj, frame, pred, obj)
}

object Triple {

  /** Custom-TTL line from the four fields it actually uses — static so
    * sink-side maps can project (and parquet scans prune) to exactly
    * these columns instead of deserializing whole Triple rows. Objects
    * wrapped in double quotes are unwrapped to the text between the first
    * quote pair (rdfify_improved.py:973-975).
    */
  def ttlLine(subj: String, frame: String, pred: String, obj: String): String = {
    val o =
      if (obj.startsWith("\"") && obj.endsWith("\"")) obj.split("\"", -1)(1)
      else obj
    s"$subj $frame:$pred $o"
  }
}

/** Canonical input-table row: Common-Crawl-style web page. */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)
