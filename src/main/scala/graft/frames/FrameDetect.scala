package graft.frames

import graft.model.{Frame, FrameElement, Sentence}
import graft.util.PyStr

/** Deterministic, lexicon-driven frame detection.
  *
  * The reference's frame identification is a T5 model
  * (modules/framesrl/framesrl_runner.py:17-28, frame_semantic_transformer) —
  * not portable. Per SURVEY.md §2.9/O1 the engine's contract is: same output
  * shape (sentences → frames → named elements), deterministic, driven by a
  * broadcast trigger lexicon; golden parity replays the reference's own
  * frames.json, so this operator defines the raw-text path's semantics.
  *
  * Each lexicon entry maps a trigger lexeme to a FrameNet-style frame with
  * subject/object role names drawn from the reference's mapping tables
  * (evaluation_pipeline/comprehensive_frame_mappings.py). Time/Place
  * elements are intentionally omitted — the converter's frame completion
  * (rdfify_improved.py:456-486) adds them from the sentence.
  */
object FrameDetect {

  /** trigger → (frame, subjectRole, objectRole?, objectIsClause) */
  final case class Template(
      frame: String,
      subjectRole: String,
      objectRole: Option[String])

  val lexicon: Map[String, Template] = Map(
    "born" -> Template("Being_born", "Child", None),
    "died" -> Template("Death", "Deceased", None),
    "wrote" -> Template("Text_creation", "Author", Some("Text")),
    "written" -> Template("Text_creation", "Author", Some("Text")),
    "authored" -> Template("Text_creation", "Author", Some("Text")),
    "published" -> Template("Text_creation", "Author", Some("Text")),
    "received" -> Template("Receiving", "Recipient", Some("Theme")),
    "won" -> Template("Win_prize", "Competitor", Some("Prize")),
    "awarded" -> Template("Award", "Recipient", Some("Award")),
    "married" -> Template("Marriage", "Spouse", Some("Spouse")),
    "studied" -> Template("Education", "Student", Some("Subject")),
    "graduated" -> Template("Education", "Student", None),
    "taught" -> Template("Education_teaching", "Teacher", Some("Subject")),
    "worked" -> Template("Employment", "Employee", None),
    "moved" -> Template("Travel", "Traveler", None),
    "traveled" -> Template("Travel", "Traveler", None),
    "founded" -> Template("Creation", "Creator", Some("Created_entity")),
    "created" -> Template("Creation", "Creator", Some("Created_entity")),
    "became" -> Template("Becoming", "Entity", Some("Attribute")),
    "joined" -> Template("Becoming_a_member", "New_member", Some("Group")),
    "led" -> Template("Leadership", "Leader", Some("Theme")),
    "influenced" -> Template("Influence", "Agent", Some("Theme")),
    "known" -> Template("Fame", "Entity", Some("Reason")))

  /** Auxiliaries/copulas trimmed from the end of the subject span. */
  private val trailingAux = Set("was", "is", "were", "are", "has", "had",
    "have", "been", "being", "also", "later", "then", "and", "he", "she",
    "it", "they", "who", "which", "that")

  def detectDoc(sentences: Vector[String]): Vector[Sentence] =
    sentences.zipWithIndex.map { case (s, i) => Sentence(i, s, detect(s)) }

  /** One frame per matched trigger token, in token order. */
  def detect(sentence: String): Vector[Frame] = {
    val tokens = tokenizeWithSpans(sentence)
    val out = Vector.newBuilder[Frame]
    tokens.zipWithIndex.foreach { case ((tok, start, end), idx) =>
      lexicon.get(PyStr.lower(tok)).foreach { t =>
        val subjectText = trimSubject(tokens.take(idx))
        val objectText = clauseAfter(sentence, end)
        val elements = Vector.newBuilder[FrameElement]
        if (subjectText.nonEmpty) elements += FrameElement(t.subjectRole, subjectText)
        t.objectRole.foreach { r =>
          if (objectText.nonEmpty) elements += FrameElement(r, objectText)
        }
        val els = elements.result()
        if (els.nonEmpty) out += Frame(t.frame, els)
      }
    }
    out.result()
  }

  private def tokenizeWithSpans(s: String): Vector[(String, Int, Int)] = {
    val out = Vector.newBuilder[(String, Int, Int)]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !Character.isLetterOrDigit(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '\'' ||
          s.charAt(i) == '’')) i += 1
        out += ((s.substring(start, i), start, i))
      }
    }
    out.result()
  }

  private def trimSubject(tokens: Vector[(String, Int, Int)]): String = {
    var toks = tokens.map(_._1)
    while (toks.nonEmpty && trailingAux(PyStr.lower(toks.last))) toks = toks.init
    toks.mkString(" ")
  }

  /** Text after the trigger up to the sentence-final punctuation, with the
    * trailing [.!?] run removed.
    */
  private def clauseAfter(sentence: String, from: Int): String = {
    var endIdx = sentence.length
    while (endIdx > from && {
      val c = sentence.charAt(endIdx - 1)
      c == '.' || c == '!' || c == '?' || PyStr.isPySpace(c)
    }) endIdx -= 1
    PyStr.strip(sentence.substring(math.min(from, endIdx), endIdx))
  }
}
