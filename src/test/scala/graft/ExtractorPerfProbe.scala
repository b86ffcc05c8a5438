package graft

import graft.extract.Extractor
import graft.fixtures.TranscriptGen
import org.scalatest.funsuite.AnyFunSuite

/** Not a correctness test — a single-thread microbenchmark of per-kind
  * extraction cost, run on demand: `testOnly graft.ExtractorPerfProbe`.
  */
class ExtractorPerfProbe extends AnyFunSuite {
  test("per-kind single-thread cost breakdown") {
    val turns = (0L until 400L).flatMap(i => TranscriptGen.conversation(42L, i))
    val byKind = turns.groupBy(t => Extractor.sniff(t.text))
    // warmup
    turns.foreach(t => Extractor.extract(t.text))
    byKind.toSeq.sortBy(_._1).foreach { case (kind, ts) =>
      val t0 = System.nanoTime()
      var chars = 0L
      var reps = 0
      while (System.nanoTime() - t0 < 2e9) {
        ts.foreach(t => chars += Extractor.extract(t.text).text.length)
        reps += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val perTurn = sec / (ts.size.toLong * reps) * 1e6
      val avgLen = ts.map(_.text.length).sum / ts.size
      println(f"KIND $kind%-6s n=${ts.size}%5d avgLen=$avgLen%6d " +
        f"perTurn=$perTurn%8.1fµs throughput=${1e6 / perTurn}%8.0f turns/s/core")
    }
    // sniff cost alone
    val t0 = System.nanoTime()
    var n = 0L
    while (System.nanoTime() - t0 < 1e9) { turns.foreach(t => Extractor.sniff(t.text)); n += turns.size }
    println(f"SNIFF perTurn=${(System.nanoTime() - t0) / 1e3 / n}%8.2fµs")
  }
}
