package graft.tools

import scala.io.Source
import graft.query.cypher.CypherParser

/** Dev tool: parse every Cypher query harvested from the reference
  * repo (src/test/resources/reference_cypher_corpus.jsonl) and report
  * the parse rate plus failures grouped by first error line — the
  * work-list for closing the reference's real query surface. */
object CorpusSweep {
  /** One corpus line: {"src": "...", "q": "..."}; values are
    * json.dumps-escaped (\n, \", \\, \uXXXX). */
  def parseLine(line: String): (String, String) = {
    val m = """\{"src": "((?:[^"\\]|\\.)*)", "q": "((?:[^"\\]|\\.)*)"\}""".r
      .findFirstMatchIn(line).getOrElse(sys.error(s"bad corpus line: $line"))
    def unesc(s: String): String = {
      val sb = new StringBuilder; var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => sb += c; i += 2
          }
        } else { sb += s(i); i += 1 }
      }
      sb.toString
    }
    (unesc(m.group(1)), unesc(m.group(2)))
  }

  def corpus(): Seq[(String, String)] =
    Source.fromFile("src/test/resources/reference_cypher_corpus.jsonl")
      .getLines().filter(_.nonEmpty).map(parseLine)
      // late harvest normalization: property-access f-string holes the
      // harvester left raw (`row.{id_field}`, neo4j.py) become `.X`
      // like every other hole — `.{word}` cannot occur in real Cypher
      .map { case (src, q) => (src, q.replaceAll("""\.\{\w+\}""", ".X")) }
      .toSeq

  def main(args: Array[String]): Unit = {
    val items = corpus()
    println(s"corpus size: ${items.size}")
    var ok = 0
    val failures = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    items.foreach { case (src, q) =>
      try CypherParser.parseQuery(q) match {
        case Right(_) => ok += 1
        case Left(err) => failures += ((src, q, err.linesIterator.next().take(90)))
      } catch { case e: Throwable => failures += ((src, q, s"THROW ${e.getMessage}".take(90))) }
    }
    println(s"parsed: $ok / ${items.size}")
    failures.groupBy(_._1).toSeq.sortBy(-_._2.size).foreach { case (src, fs) =>
      println(s"FAILSRC ${fs.size} $src")
    }
    failures.groupBy(_._3).toSeq.sortBy(-_._2.size).foreach { case (err, fs) =>
      println(s"\n=== ${fs.size} x $err")
      fs.foreach { case (src, q, _) =>
        println(s"  [$src] ${q.replaceAll("\\s+", " ").take(150)}")
      }
    }
  }
}
