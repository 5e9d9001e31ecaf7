package graft.rdf

import java.util.regex.Pattern

import scala.collection.mutable

import graft.model._
import graft.util.PyStr

/** Frames + entities → RDF triples for one document.
  *
  * Faithful Scala re-expression of the reference converter's per-document
  * control flow (modules/orchestrator/rdfify_improved.py:212-1199), with the
  * LLM coref strategy replaced by the deterministic chain in [[Coref]].
  * Pure JVM code — no Spark dependency — so the pipeline can run it inside
  * `mapPartitions`/`flatMapGroups` and tests can drive it directly.
  *
  * Everything here is order- and tie-break-sensitive (SURVEY.md §7.3.1):
  * list orders mirror the Python insertion orders, first-match/first-max
  * semantics mirror Python `max()`/loop-break behavior, and string
  * operations go through [[PyStr]] to match Python `str` semantics.
  */
object TripleEmitter {

  /** rdfify_improved.py:429 — element texts dropped before emission. */
  private val stopElementTexts = Set("", "to", "from", "about", "in", "on", "at")

  /** rdfify_improved.py:913 — leading prepositions stripped from values. */
  private val prepositions =
    List("to", "from", "about", "in", "on", "at", "with", "by", "for", "of",
      "the", "a", "an")

  /** rdfify_improved.py:828-837 — object texts never converted to URIs. */
  private val skipPatterns = List(
    "her ", "his ", "their ", "its ", "our ",
    "the ", "a ", "an ",
    "this ", "that ", "these ", "those ",
    "novels", "stories", "plays", "books",
    "marriage", "child", "mother", "father",
    "knowledge", "headlines", "copies",
    "writer", "author", "detective",
    "world", "hospital", "family")

  /** rdfify_improved.py:463 */
  private val yearPattern =
    Pattern.compile("\\b(19|20)\\d{2}\\b", Pattern.UNICODE_CHARACTER_CLASS)

  /** rdfify_improved.py:473-476 */
  private val locationPatterns = List(
    Pattern.compile("\\bin\\s+([A-Z][a-z]+(?:\\s+[A-Z][a-z]+)*)",
      Pattern.UNICODE_CHARACTER_CLASS),
    Pattern.compile("\\bat\\s+([A-Z][a-z]+(?:\\s+[A-Z][a-z]+)*)",
      Pattern.UNICODE_CHARACTER_CLASS))

  /** rdfify_improved.py:1039-1046 — predicates marking high-priority
    * (person/agent) subject roles.
    */
  private val subjectPredicatesHigh = Set(
    "has_person", "has_agent", "has_author", "has_creator", "has_achiever",
    "has_competitor", "has_leader", "has_speaker", "has_authority",
    "has_governor", "has_traveler", "has_arriver", "has_employee",
    "has_student", "has_recipient", "has_judge", "has_evaluator",
    "has_assessor", "has_classifier", "has_typer", "has_perceiver",
    "has_seer", "has_hearer", "has_thinker", "has_believer", "has_knower",
    "has_experiencer", "has_lover", "has_hater", "has_hoper", "has_owner",
    "has_possessor", "has_user", "has_consumer", "has_buyer", "has_seller",
    "has_donor", "has_manufacturer", "has_producer")

  /** rdfify_improved.py:1048-1049 */
  private val subjectPredicatesMedium = Set("has_theme", "has_item", "has_category")

  /** rdfify_improved.py:1058-1062 — generic fallback subject roles. */
  private val genericSubjectRoles: Map[String, Double] = Map(
    "Agent" -> 1.0, "Author" -> 1.0, "Child" -> 1.0, "Person" -> 1.0,
    "Entity" -> 0.8, "Protagonist" -> 1.0, "Ego" -> 1.0, "Partner_1" -> 0.8,
    "Cognizer" -> 0.9, "Speaker" -> 0.9, "Creator" -> 0.9, "Performer" -> 0.9,
    "Theme" -> 0.5)

  /** rdfify_improved.py:579-583 — roles map for semantic-relevance scoring
    * (differs from the generic fallback above: Child 0.9, no Person).
    */
  private val relevanceRoles: Map[String, Double] = Map(
    "Agent" -> 1.0, "Author" -> 1.0, "Child" -> 0.9, "Entity" -> 0.8,
    "Protagonist" -> 1.0, "Ego" -> 0.9, "Partner_1" -> 0.8, "Cognizer" -> 0.9,
    "Speaker" -> 0.9, "Creator" -> 0.9, "Performer" -> 0.9)

  /** rdfify_improved.py:1110-1120 */
  private val personCentricFrames = Set(
    "Being_born", "Death", "Marriage", "Divorce", "Education", "Employment",
    "Retirement", "Win_prize", "Award", "Achievement", "Leadership",
    "Authority", "Travel", "Arrival", "Departure", "Communication",
    "Speaking", "Writing", "Reading", "Meeting", "Social_event", "Friendship",
    "Relationship", "Creation", "Production", "Consumption", "Use",
    "Purchase", "Sale", "Possession", "Ownership", "Transfer", "Perception",
    "Seeing", "Hearing", "Thinking", "Belief", "Knowledge", "Emotion", "Love",
    "Hate", "Fear", "Hope", "Judgment", "Evaluation", "Assessment",
    "Categorization", "Classification", "Typing")

  /** rdfify_improved.py:1137-1139 */
  private val personNameIndicators =
    List("mr.", "mrs.", "ms.", "dr.", "prof.", "sir", "dame", "lord", "lady")

  // ---------------------------------------------------------------------
  // Entry point
  // ---------------------------------------------------------------------

  /** Convert one document's frames + entities to its triple set.
    * Mirrors RDFConvertor.convert (rdfify_improved.py:252-293).
    */
  def convert(
      docId: String,
      sentences: Seq[Sentence],
      entities: Seq[EntityMention]): Vector[Triple] =
    convert(docId, sentences, entities, useProtagonist = true)

  /** `useProtagonist = false` ablates the document-protagonist prior
    * (pronouns then fall through to the deterministic coref chain alone)
    * — the measurement knob behind the parity-ablation numbers in
    * BENCH.md.
    */
  def convert(
      docId: String,
      sentences: Seq[Sentence],
      entities: Seq[EntityMention],
      useProtagonist: Boolean): Vector[Triple] = {
    val protagonist =
      if (useProtagonist) Protagonist.select(entities, Protagonist.titleOf(docId))
      else None
    var context = Vector.empty[CtxEntity]
    val seenMentions = mutable.HashSet.empty[String]
    // insertion-ordered dedup on (subj, predUri, obj) — mirrors both
    // emitted_triples (rdfify_improved.py:812-815) and rdflib set semantics
    val emitted = mutable.LinkedHashMap.empty[(String, String, String), Triple]

    // stripped + lowered mention per entity, computed once per document
    val stripped = entities.map(e => PyStr.strip(e.mention)).toArray
    val loweredM = stripped.map(PyStr.lower)

    sentences.foreach { sentence =>
      // _add_entities_from_sentence (rdfify_improved.py:325-343)
      val sl = PyStr.lower(sentence.text)
      var ei = 0
      entities.foreach { e =>
        val m = stripped(ei)
        val ml = loweredM(ei)
        ei += 1
        if (m.nonEmpty && sl.contains(ml) && !seenMentions.contains(ml)) {
          seenMentions += ml
          context = context :+ CtxEntity(m, e.uri, e.confidence)
        }
      }
      sentence.frames.foreach { frame =>
        processFrame(docId, frame, sentence.text, context, protagonist, emitted)
      }
    }
    emitted.values.toVector
  }

  // ---------------------------------------------------------------------
  // Frame processing (rdfify_improved.py:345-454)
  // ---------------------------------------------------------------------

  private def processFrame(
      docId: String,
      frame: Frame,
      sentenceText: String,
      ctx: Vector[CtxEntity],
      protagonist: Option[String],
      emitted: mutable.LinkedHashMap[(String, String, String), Triple]): Unit = {
    if (frame.elements.isEmpty) return

    val completed = improveFrameCompletion(frame, sentenceText)
    val resolved =
      completed.elements.map(preResolveElement(_, ctx, sentenceText, protagonist))

    var mainEntity =
      identifyMainEntity(sentenceText, ctx, frame.name, resolved)
    if (mainEntity.isEmpty) {
      // fallback (rdfify_improved.py:362-396)
      if (resolved.nonEmpty) {
        val elementText = PyStr.strip(resolved.head.text)
        if (elementText.nonEmpty && elementText.length > 1) {
          mainEntity = findEntityBySubset(elementText, ctx)
            .orElse(Some(CtxEntity(elementText, "", 0.5)))
        } else return
      } else return
    }

    val me = mainEntity.get
    val subject = if (me.uri.startsWith("http")) me.uri else me.mention

    resolved.foreach { el =>
      val keep = el.text.nonEmpty && !stopElementTexts(PyStr.strip(el.text))
      if (keep) {
        val basePred = FrameMappings.predicateForRole(el.name, frame.name)
        emitSmartSubject(docId, subject, frame.name, el.name, basePred, el.text,
          ctx, sentenceText, protagonist, emitted)
      }
    }
  }

  /** rdfify_improved.py:456-486 — add missing Time/Place elements. */
  private[rdf] def improveFrameCompletion(
      frame: Frame,
      sentenceText: String): Frame = {
    var elements = frame.elements
    if (!elements.exists(_.name == "Time")) {
      val m = yearPattern.matcher(sentenceText)
      if (m.find()) elements = elements :+ FrameElement("Time", m.group())
    }
    if (!elements.exists(e => e.name == "Place" || e.name == "Location")) {
      locationPatterns.iterator
        .map(_.matcher(sentenceText))
        .find(_.find())
        .foreach(m => elements = elements :+ FrameElement("Place", m.group(1)))
    }
    if (elements eq frame.elements) frame else frame.copy(elements = elements)
  }

  /** rdfify_improved.py:488-526 — pronoun pre-resolution in elements. */
  private def preResolveElement(
      el: FrameElement,
      ctx: Vector[CtxEntity],
      sentence: String,
      protagonist: Option[String]): FrameElement = {
    val elementText = PyStr.strip(el.text)
    if (Coref.pronouns(PyStr.lower(elementText))) {
      Coref.resolve(elementText, ctx, sentence, protagonist) match {
        case Some(r) => el.copy(text = r)
        case None => el
      }
    } else el
  }

  // ---------------------------------------------------------------------
  // Main-entity (subject) selection (rdfify_improved.py:528-569 + helpers)
  // ---------------------------------------------------------------------

  private def identifyMainEntity(
      sentenceText: String,
      ctx: Vector[CtxEntity],
      frameName: String,
      elements: Vector[FrameElement]): Option[CtxEntity] = {
    if (ctx.isEmpty) return None
    val frameAware = identifyFrameAwareSubject(ctx, frameName, elements)
    if (frameAware.isDefined) return frameAware
    if (personCentricFrames(frameName)) {
      val person = findBestPersonEntity(ctx)
      if (person.isDefined) return person
    }
    if (elements.nonEmpty) {
      val fromElements = identifyFromFrameElements(ctx, elements)
      if (fromElements.isDefined) return fromElements
    }
    val early = findEarlySentenceEntity(sentenceText, ctx)
    if (early.isDefined) return early
    Some(ctx.maxBy(_.confidence)) // strategy 5 + fallback-first collapse
  }

  /** rdfify_improved.py:983-1020 */
  private def identifyFrameAwareSubject(
      ctx: Vector[CtxEntity],
      frameName: String,
      elements: Vector[FrameElement]): Option[CtxEntity] = {
    if (elements.isEmpty || ctx.isEmpty) return None
    val subjectRoles = subjectRolesForFrame(frameName)
    if (subjectRoles.isEmpty) return None
    var best: Option[CtxEntity] = None
    var bestScore = 0.0
    elements.foreach { el =>
      subjectRoles.get(el.name).foreach { rolePriority =>
        findBestEntityForElement(el.text, ctx).foreach { m =>
          val score = rolePriority * 0.7 + m.confidence * 0.3
          if (score > bestScore) {
            bestScore = score
            best = Some(m)
          }
        }
      }
    }
    best
  }

  /** rdfify_improved.py:1022-1062 */
  private[rdf] def subjectRolesForFrame(frameName: String): Map[String, Double] =
    FrameMappings.frameSpecific.get(frameName) match {
      case Some(frameMapping) =>
        frameMapping.map { case (role, predicate) =>
          val p =
            if (subjectPredicatesHigh(predicate)) 1.0
            else if (subjectPredicatesMedium(predicate)) 0.5
            else 0.3
          role -> p
        }
      case None => genericSubjectRoles
    }

  /** rdfify_improved.py:1064-1106 */
  private def findBestEntityForElement(
      elementText: String,
      ctx: Vector[CtxEntity]): Option[CtxEntity] = {
    if (elementText.isEmpty || ctx.isEmpty) return None
    val elementLower = PyStr.strip(PyStr.lower(elementText))
    var best: Option[CtxEntity] = None
    var bestScore = 0.0
    ctx.foreach { e =>
      val mention = PyStr.strip(e.mention)
      if (mention.nonEmpty) {
        val ml = PyStr.lower(mention)
        var score = 0.0
        if (ml == elementLower) score = 1.0
        else if (elementLower.contains(ml) || ml.contains(elementLower)) {
          val coverage = math.min(mention.length, elementText.length).toDouble /
            math.max(mention.length, elementText.length)
          score = coverage * 0.8
        } else if (PyStr.split(ml).exists(w =>
            w.length > 2 && elementLower.contains(w))) {
          score = 0.3
        }
        if (e.uri.nonEmpty && e.uri.startsWith("http")) score *= 1.2
        score += e.confidence * 0.1
        if (score > bestScore) {
          bestScore = score
          best = Some(e)
        }
      }
    }
    if (bestScore > 0.2) best else None
  }

  /** rdfify_improved.py:1123-1152 */
  private def findBestPersonEntity(ctx: Vector[CtxEntity]): Option[CtxEntity] = {
    if (ctx.isEmpty) return None
    val persons = ctx.filter { e =>
      val mention = e.mention
      val ml = PyStr.lower(mention)
      personNameIndicators.exists(ml.contains(_)) || {
        val words = PyStr.split(mention)
        words.length >= 2 && Character.isUpperCase(mention.charAt(0)) &&
        words.forall(w => Character.isUpperCase(w.charAt(0)))
      }
    }
    val pool = if (persons.nonEmpty) persons else ctx
    Some(pool.maxBy(_.confidence))
  }

  /** rdfify_improved.py:1154-1173 */
  private def identifyFromFrameElements(
      ctx: Vector[CtxEntity],
      elements: Vector[FrameElement]): Option[CtxEntity] = {
    if (elements.isEmpty || ctx.isEmpty) return None
    var best: Option[CtxEntity] = None
    var bestScore = 0.0
    elements.foreach { el =>
      ctx.foreach { e =>
        val score = semanticRelevance(el.name, el.text, e.mention, e.confidence)
        if (score > bestScore) {
          bestScore = score
          best = Some(e)
        }
      }
    }
    if (bestScore > 0.3) best else None
  }

  /** rdfify_improved.py:571-606 */
  private def semanticRelevance(
      role: String,
      elementText: String,
      mention: String,
      confidence: Double): Double = {
    var score = 0.0
    score += confidence * 0.3
    score += relevanceRoles.getOrElse(role, 0.5) * 0.4
    val elementLower = PyStr.lower(elementText)
    val mentionLower = PyStr.lower(mention)
    if (mentionLower == elementLower) score += 0.3
    else if (mention.length > 5 && elementLower.contains(mentionLower)) {
      val coverage = mention.length.toDouble / elementText.length
      score += coverage * 0.2
    }
    // ('person' in entity-type) branch: entity type is always "" for context
    // entities (rdfify_improved.py:339-343) — never fires.
    if (PyStr.split(mention).length >= 2) score += 0.1
    math.min(score, 1.0)
  }

  /** rdfify_improved.py:1175-1192 */
  private def findEarlySentenceEntity(
      sentenceText: String,
      ctx: Vector[CtxEntity]): Option[CtxEntity] = {
    if (ctx.isEmpty) return None
    val sl = PyStr.lower(sentenceText)
    var best: Option[CtxEntity] = None
    var earliest = Int.MaxValue
    ctx.foreach { e =>
      if (e.mention.nonEmpty) {
        val pos = sl.indexOf(PyStr.lower(e.mention))
        if (pos != -1 && pos < earliest) {
          earliest = pos
          best = Some(e)
        }
      }
    }
    best
  }

  /** rdfify_improved.py:608-635 */
  private def findEntityBySubset(
      elementText: String,
      ctx: Vector[CtxEntity]): Option[CtxEntity] = {
    val elementLower = PyStr.strip(PyStr.lower(elementText))
    if (elementLower.length < 3) return None
    ctx.find { e =>
      val mention = PyStr.strip(e.mention)
      mention.nonEmpty && e.uri.nonEmpty && e.uri.startsWith("http") && {
        val ml = PyStr.lower(mention)
        ml.length >= 3 && (ml.contains(elementLower) || elementLower.contains(ml))
      }
    }
  }

  // ---------------------------------------------------------------------
  // Emission (rdfify_improved.py:758-855, 907-920)
  // ---------------------------------------------------------------------

  private def emitSmartSubject(
      docId: String,
      subject: String,
      frameName: String,
      role: String,
      basePred: String,
      value: String,
      ctx: Vector[CtxEntity],
      sentence: String,
      protagonist: Option[String],
      emitted: mutable.LinkedHashMap[(String, String, String), Triple]): Unit = {
    if (value.isEmpty || subject.isEmpty) return
    val cleaned = cleanValue(value)
    if (cleaned.isEmpty) return

    val objOpt: Option[(String, Boolean)] =
      if (Coref.pronouns(PyStr.lower(cleaned))) {
        Coref.resolve(cleaned, ctx, sentence, protagonist) match {
          case Some(r) if r.nonEmpty => Some((r, r.startsWith("http")))
          case _ => None // unresolvable pronoun object: skip triple
        }
      } else Some(smartObjectResolution(cleaned, ctx))

    objOpt.foreach { case (obj, objIsUri) =>
      if (subject != obj) { // self-referential filter (rdfify_improved.py:805-809)
        val subjIsUri = subject.startsWith("http")
        val predUri = s"http://example.org/frame/$frameName#$basePred"
        val key = (subject, predUri, obj)
        if (!emitted.contains(key)) {
          emitted.update(key,
            Triple(docId, subject, subjIsUri, frameName, role, basePred, obj,
              objIsUri))
        }
      }
    }
  }

  /** rdfify_improved.py:907-920 */
  private[rdf] def cleanValue(value: String): String = {
    if (value.isEmpty) return ""
    val cleaned = PyStr.strip(value)
    var words = PyStr.split(cleaned)
    while (words.nonEmpty && prepositions.contains(PyStr.lower(words.head)))
      words = words.tail
    val result = PyStr.strip(words.mkString(" "))
    if (result.nonEmpty && !prepositions.contains(PyStr.lower(result))) result
    else ""
  }

  /** rdfify_improved.py:821-855 */
  private def smartObjectResolution(
      text: String,
      ctx: Vector[CtxEntity]): (String, Boolean) = {
    if (PyStr.strip(text).length < 3) return (text, false)
    val textLower = PyStr.strip(PyStr.lower(text))
    if (skipPatterns.exists(textLower.contains(_))) return (text, false)
    ctx.foreach { e =>
      val mention = PyStr.strip(e.mention)
      if (mention.nonEmpty && e.uri.nonEmpty && e.uri.startsWith("http") &&
        PyStr.lower(mention) == textLower) {
        return (e.uri, true)
      }
    }
    (text, false)
  }
}
