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

  /** trigger → (frame, subjectRole?, objectRole?) */
  final case class Template(
      frame: String,
      subjectRole: Option[String],
      objectRole: Option[String])

  private def t(frame: String, subj: String, obj: String): Template =
    Template(frame,
      if (subj.isEmpty) None else Some(subj),
      if (obj.isEmpty) None else Some(obj))

  /** Trigger lexicon mined from the golden frames corpus: tokens outside
    * element spans with P(frame|token) ≥ 0.6 and count ≥ 4, frame names and
    * role pairs taken from each frame's dominant golden roles (subject =
    * most frequent agentive role per the predicate tables, object = most
    * frequent other non-Time/Place role). Hand entries cover verbs the
    * reduced corpus lacks. Deterministic; same output shape as the
    * reference's T5 stage (framesrl_runner.py:17-28).
    */
  val lexicon: Map[String, Template] = Map(
    // mined (count, precision in golden shown in mining script output)
    "born" -> t("Being_born", "Child", ""),
    "see" -> t("Reference_text", "", "Source_of_information"),
    "wrote" -> t("Text_creation", "Author", "Text"),
    "written" -> t("Text_creation", "Author", "Text"),
    "authored" -> t("Text_creation", "Author", "Text"),
    "published" -> t("Text_creation", "Author", "Text"),
    "regarded" -> t("Categorization", "Item", "Category"),
    "considered" -> t("Categorization", "Item", "Category"),
    "became" -> t("Becoming", "Entity", "Final_category"),
    "died" -> t("Death", "Protagonist", ""),
    "include" -> t("Inclusion", "Total", "Part"),
    "included" -> t("Inclusion", "Total", "Part"),
    "includes" -> t("Inclusion", "Total", "Part"),
    "lived" -> t("Residence", "Resident", "Location"),
    "began" -> t("Activity_start", "Agent", "Activity"),
    "won" -> t("Win_prize", "Competitor", "Prize"),
    "awarded" -> t("Receiving", "Recipient", "Theme"),
    "received" -> t("Receiving", "Recipient", "Theme"),
    "attended" -> t("Attending", "Agent", "Event"),
    "raised" -> t("Growing_food", "Grower", ""),
    "helped" -> t("Assistance", "Helper", "Goal"),
    "help" -> t("Assistance", "Helper", "Goal"),
    "remains" -> t("State_continue", "Entity", "State"),
    "according" -> t("Attributed_information", "", "Speaker"),
    "appointed" -> t("Appointing", "Official", "Role"),
    "followed" -> t("Relative_time", "Focal_occasion", "Landmark_occasion"),
    "sold" -> t("Commerce_sell", "Seller", "Goods"),
    "worked" -> t("Being_employed", "Employee", "Position"),
    "working" -> t("Being_employed", "Employee", "Position"),
    "credited" -> t("Praiseworthiness", "Evaluee", "Behavior"),
    "noted" -> t("Fame", "Entity", "Reason"),
    "known" -> t("Fame", "Entity", "Reason"),
    "continued" -> t("Activity_ongoing", "Agent", "Activity"),
    // hand entries for verbs absent from the reduced golden corpus
    "studied" -> t("Education_teaching", "Student", "Skill"),
    "graduated" -> t("Education_teaching", "Student", ""),
    "taught" -> t("Education_teaching", "Teacher", "Skill"),
    "married" -> t("Forming_relationships", "Partner_1", "Partner_2"),
    "moved" -> t("Travel", "Traveler", ""),
    "traveled" -> t("Travel", "Traveler", ""),
    "founded" -> t("Intentionally_create", "Creator", "Created_entity"),
    "created" -> t("Intentionally_create", "Creator", "Created_entity"),
    "joined" -> t("Becoming_a_member", "New_member", "Group"),
    "led" -> t("Leadership", "Leader", "Theme"),
    "influenced" -> t("Influence", "Agent", "Theme"))

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
        t.subjectRole.foreach { r =>
          if (subjectText.nonEmpty) elements += FrameElement(r, subjectText)
        }
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
