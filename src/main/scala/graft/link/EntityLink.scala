package graft.link

import scala.collection.mutable

import graft.extract.Chunker
import graft.model.EntityMention
import graft.util.PyStr

/** Deterministic entity linking: alias-dictionary candidate matching over
  * text chunks, reproducing the reference REL stage's *output contract*
  * (modules/rel_linker/rel_runner_fixed.py:42-160) — including the
  * `end = length` quirk (the API's 2nd tuple field is the mention length;
  * chunked docs then add the chunk offset to both start and end,
  * rel_runner_fixed.py:133-136) and the (mention,start,end) first-wins
  * dedup (rel_runner_fixed.py:149-158).
  *
  * The remote REL model is replaced by longest-match scanning against the
  * broadcast [[AliasDict]] (north_star: "hash-join candidate generation
  * against a broadcast alias dictionary"): at each token start, the longest
  * known alias (case-insensitive) wins; its dictionary confidence is
  * thresholded like the reference's confidence filter
  * (rel_runner_fixed.py:83-96, threshold 0.35 in batch mode,
  * batch_pipeline.py:123).
  */
object EntityLink {

  val BatchThreshold = 0.35

  def link(
      docId: String,
      text: String,
      dict: AliasDict,
      threshold: Double = BatchThreshold,
      disambiguator: Disambiguator = null): Vector[EntityMention] = {
    // doc token set computed once; null disambiguator → surface's sole
    // dictionary entry wins (last-write-wins, the reference-index analogue)
    val docToks =
      if (disambiguator == null) null else Disambiguator.docTokens(text)
    val all = Vector.newBuilder[EntityMention]
    if (text.length <= 500) {
      all ++= linkChunk(docId, text, 0, dict, threshold, disambiguator, docToks)
    } else {
      Chunker.withOffsets(text).foreach { case (chunk, offset) =>
        all ++= linkChunk(docId, chunk, offset, dict, threshold, disambiguator, docToks)
      }
    }
    // dedup on (mention, start, end), first wins
    val seen = mutable.HashSet.empty[(String, Int, Int)]
    all.result().filter { e =>
      val k = (e.mention, e.start, e.end)
      if (seen(k)) false else { seen += k; true }
    }
  }

  /** Tokenize with char offsets: (token, startChar). */
  private def tokenize(s: String): Vector[(String, Int)] = {
    val out = Vector.newBuilder[(String, Int)]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && (Character.isLetterOrDigit(s.charAt(i)) ||
          s.charAt(i) == '\'' || s.charAt(i) == '’' || s.charAt(i) == '.' ||
          s.charAt(i) == '-')) i += 1
        // trim trailing punctuation that is not inside the token
        var end = i
        while (end > start && (s.charAt(end - 1) == '.' || s.charAt(end - 1) == '-' ||
          s.charAt(end - 1) == '\'' || s.charAt(end - 1) == '’')) end -= 1
        if (end > start) out += ((s.substring(start, end), start))
      }
    }
    out.result()
  }

  private def linkChunk(
      docId: String,
      chunk: String,
      offset: Int,
      dict: AliasDict,
      threshold: Double,
      disambiguator: Disambiguator = null,
      docToks: Set[String] = null): Vector[EntityMention] = {
    val tokens = tokenize(chunk)
    val loweredTok = new Array[String](tokens.length)
    var li = 0
    while (li < tokens.length) { loweredTok(li) = PyStr.lower(tokens(li)._1); li += 1 }
    val out = Vector.newBuilder[EntityMention]
    var ti = 0
    while (ti < tokens.length) {
      var node = dict.trie
      var best: Option[(AliasEntry, Int)] = None // entry + end-token index
      var tj = ti
      var continue = true
      while (continue && tj < tokens.length) {
        node.children.get(loweredTok(tj)) match {
          case Some(next) =>
            node = next
            if (node.entry.isDefined) best = Some((node.entry.get, tj))
            tj += 1
          case None => continue = false
        }
      }
      best match {
        case Some((entry0, endTok)) =>
          val startChar = tokens(ti)._2
          val endChar = tokens(endTok)._2 + tokens(endTok)._1.length
          val surface = chunk.substring(startChar, endChar)
          // context-cosine disambiguation between candidate URIs, if enabled
          val entry =
            if (disambiguator == null) entry0
            else disambiguator.resolve(PyStr.lower(entry0.mention), docToks)
              .map(c => entry0.copy(entity = c.entity, uri = c.uri,
                confidence = c.confidence))
              .getOrElse(entry0)
          if (entry.confidence >= threshold) {
            out += EntityMention(
              docId,
              mention = surface,
              entity = entry.entity,
              uri = entry.uri,
              start = offset + startChar,
              end = offset + surface.length, // reference quirk: end = offset + length
              confidence = entry.confidence)
          }
          ti = endTok + 1
        case None => ti += 1
      }
    }
    out.result()
  }
}
