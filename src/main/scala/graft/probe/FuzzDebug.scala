package graft.probe

import graft.text.{Chunker, PyText}
import scala.util.Random

object FuzzDebug {
  private val Words = Vector("spark", "Shuffle", "JOIN", "łódź", "data",
    "x", "partition", "42", "e.g", "Dr", "ZAŻÓŁĆ")
  private val Glue = Vector(" ", "  ", ". ", "! ", "? ", ".\n", "\n", "\t",
    "... ", ".", "", " . ")

  private def randomText(r: Random): String = {
    val n = r.nextInt(120)
    val sb = new StringBuilder
    (0 until n).foreach { _ =>
      sb.append(Words(r.nextInt(Words.length)))
      sb.append(Glue(r.nextInt(Glue.length)))
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val r = new Random(20260817L)
    var text = ""
    var size = 0
    var ov = 0
    (0 to 7).foreach { _ =>
      text = randomText(r)
      size = 32 + r.nextInt(300)
      ov = r.nextInt(size)
    }
    println(s"size=$size ov=$ov text=[${text.replace("\n", "\\n").replace("\t", "\\t")}]")
    val sents = Chunker.splitIntoSentences(text)
    sents.zipWithIndex.foreach { case (s, i) =>
      println(s"  sent$i [${s.text.replace("\n", "\\n")}] (${s.start},${s.end})")
    }
    val chunks = Chunker.splitTextWithOverlap(text, size, ov)
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"  chunk$i [${c.content.replace("\n", "\\n")}]")
    }
    val lost = PyText.pySplit(text).toSet --
      chunks.flatMap(c => PyText.pySplit(c.content)).toSet
    println(s"lost=$lost")
  }
}
