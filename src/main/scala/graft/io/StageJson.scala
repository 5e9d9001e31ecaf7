package graft.io

import java.io.InputStream

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._

/** Parsers for the reference's stage-file JSON shapes (SURVEY.md §1.1):
  * frames.json (framesrl_runner.py:17-28) and entities.json
  * (rel_runner_fixed.py:198-204). Pure Jackson — usable without a
  * SparkSession (tests, driver-side fixture prep).
  */
object StageJson {

  private val mapper = new ObjectMapper()

  private def textOr(n: JsonNode, field: String, default: String): String = {
    val v = n.get(field)
    if (v == null || v.isNull) default else v.asText()
  }

  def parseFrames(docId: String, in: InputStream): FramesDoc = {
    val root = mapper.readTree(in)
    val sentences = Option(root.get("sentences")).map(_.elements().asScala.toVector)
      .getOrElse(Vector.empty)
      .map { s =>
        val frames = Option(s.get("frames")).map(_.elements().asScala.toVector)
          .getOrElse(Vector.empty)
          .map { f =>
            val elements = Option(f.get("elements"))
              .map(_.elements().asScala.toVector)
              .getOrElse(Vector.empty)
              .map(e => FrameElement(textOr(e, "name", ""), textOr(e, "text", "")))
            Frame(textOr(f, "name", "Unknown"), elements)
          }
        Sentence(
          Option(s.get("index")).map(_.asInt()).getOrElse(0),
          textOr(s, "text", ""),
          frames)
      }
    FramesDoc(docId, sentences)
  }

  def parseEntities(docId: String, in: InputStream): Vector[EntityMention] = {
    val root = mapper.readTree(in)
    Option(root.get("entities")).map(_.elements().asScala.toVector)
      .getOrElse(Vector.empty)
      .map { e =>
        EntityMention(
          docId,
          textOr(e, "mention", ""),
          textOr(e, "entity", ""),
          textOr(e, "uri", ""),
          Option(e.get("start")).map(_.asInt()).getOrElse(0),
          Option(e.get("end")).map(_.asInt()).getOrElse(0),
          Option(e.get("confidence")).map(_.asDouble()).getOrElse(0.0))
      }
  }
}
