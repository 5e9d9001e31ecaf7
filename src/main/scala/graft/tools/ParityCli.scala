package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.io.StageJson
import graft.rdf.TripleEmitter

/** CLI surface for the frames→triples core: replays a reference-style
  * evaluation_outputs directory (per-author srl/frames.json +
  * rel/entities.json) through [[TripleEmitter]], optionally writes our TTL
  * per author, and reports corpus P/R vs the golden rdf.ttl files.
  *
  * Usage: runMain graft.tools.ParityCli <evaluation_outputs_dir> [outDir]
  *        [--ablate-protagonist]
  *
  * `--ablate-protagonist` re-runs the conversion with the document-
  * protagonist prior disabled, to quantify how much of the corpus P/R
  * the prior contributes (BENCH.md ablation table).
  */
object ParityCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ParityCli <evaluation_outputs_dir> [outDir] [--ablate-protagonist]")
    val ablate = args.contains("--ablate-protagonist")
    val pos = args.filterNot(_.startsWith("--"))
    val base = Paths.get(pos(0))
    val outDir = pos.lift(1).map(Paths.get(_))
    outDir.foreach(Files.createDirectories(_))

    val authors = Files.list(base).iterator.asScala
      .filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toVector.sorted
    var tp = 0L; var fp = 0L; var fn = 0L; var n = 0
    val perAuthor = Vector.newBuilder[(String, Long, Long, Long)]
    authors.foreach { a =>
      val fr = base.resolve(s"$a/srl/${a}_frames.json")
      val en = base.resolve(s"$a/rel/${a}_entities.json")
      val gold = base.resolve(s"$a/rdf/${a}_rdf.ttl")
      if (Files.exists(fr) && Files.exists(en)) {
        val frames = StageJson.parseFrames(a, Files.newInputStream(fr))
        val ents = StageJson.parseEntities(a, Files.newInputStream(en))
        val triples =
          TripleEmitter.convert(a, frames.sentences, ents, useProtagonist = !ablate)
        outDir.foreach { d =>
          val body = "# RDF Triples in custom format\n# Format: subject predicate object\n\n" +
            triples.map(_.ttlLine).mkString("", "\n", "\n")
          Files.write(d.resolve(s"${a}_rdf.ttl"), body.getBytes(StandardCharsets.UTF_8))
        }
        if (Files.exists(gold)) {
          val ours = triples.map(_.ttlLine).toSet
          val g = Files.readAllLines(gold, StandardCharsets.UTF_8).asScala
            .filter(l => l.nonEmpty && !l.startsWith("#")).toSet
          val (atp, afp, afn) =
            ((ours & g).size.toLong, (ours -- g).size.toLong, (g -- ours).size.toLong)
          tp += atp; fp += afp; fn += afn
          perAuthor += ((a, atp, afp, afn))
          n += 1
        }
      }
    }
    if (n > 0) {
      val p = tp.toDouble / (tp + fp)
      val r = tp.toDouble / (tp + fn)
      val mode = if (ablate) " (protagonist ABLATED)" else ""
      println(f"parity$mode: authors=$n precision=$p%.4f recall=$r%.4f tp=$tp fp=$fp fn=$fn")
      if (sys.env.contains("GRAFT_PARITY_PER_AUTHOR"))
        perAuthor.result().foreach { case (a, atp, afp, afn) =>
          println(s"author\t$a\ttp=$atp\tfp=$afp\tfn=$afn")
        }
    } else println(s"no golden docs found under $base")
  }
}
