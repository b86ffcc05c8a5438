package graft.probe
import graft.fixtures.TranscriptGen
import graft.extract.Extractor
import graft.text.Chunker

object ChunkPerf {
  def main(args: Array[String]): Unit = {
    val turns = (0 until 3000).flatMap(i => TranscriptGen.conversation(42L, i.toLong))
    println(s"turns=${turns.size}")
    // warm
    turns.take(2000).foreach { t => val e = Extractor.extract(t.text); Chunker.splitTextWithOverlap(e.text, 512, 50) }
    var t0 = System.nanoTime()
    val exs = turns.map(t => Extractor.extract(t.text))
    val exSec = (System.nanoTime()-t0)/1e9
    t0 = System.nanoTime()
    var nc = 0
    exs.foreach { e => nc += Chunker.splitTextWithOverlap(e.text, 512, 50).size }
    val chSec = (System.nanoTime()-t0)/1e9
    println(f"extract: ${exSec*1e6/turns.size}%.1f us/turn   chunk: ${chSec*1e6/turns.size}%.1f us/turn   nChunks=$nc")
    // breakdown by kind: extraction AND chunking cost per format
    val byKind = turns.groupBy(t => Extractor.sniff(t.text))
    byKind.foreach { case (k, ts) =>
      val t2 = System.nanoTime()
      val es = ts.map(t => Extractor.extract(t.text))
      val exUs = (System.nanoTime() - t2) / 1e3 / ts.size
      val t1 = System.nanoTime()
      es.foreach(e => Chunker.splitTextWithOverlap(e.text, 512, 50))
      println(f"  kind=$k%-8s n=${ts.size}%6d extract=$exUs%.1f us/turn chunk=${(System.nanoTime()-t1)/1e3/ts.size}%.1f us/turn avgLen=${es.map(_.text.length).sum/math.max(es.size,1)}")
    }
  }
}
