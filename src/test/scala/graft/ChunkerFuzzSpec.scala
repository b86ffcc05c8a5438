package graft

import graft.text.{Chunker, PyText, Tokenizer}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property fuzz over the chunker family and tokenizer (round-1's fuzzing
  * of the extractors found two real bugs; these cover the remaining text
  * surfaces). Seeded — failures reproduce.
  */
class ChunkerFuzzSpec extends AnyFunSuite {

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

  private def wordsOf(s: String): Set[String] =
    PyText.pySplit(s).toSet.filter(_.nonEmpty)

  test("splitTextWithOverlap: coverage, bounds, determinism (500 cases)") {
    val r = new Random(20260817L)
    (0 until 500).foreach { i =>
      val text = randomText(r)
      val size = 32 + r.nextInt(300)
      val ov = r.nextInt(size)
      val chunks = Chunker.splitTextWithOverlap(text, size, ov)
      val ctx = s"case $i size=$size ov=$ov"
      if (PyText.pyStrip(text).nonEmpty) {
        assert(chunks.nonEmpty, s"$ctx: non-blank text must chunk")
        // reference property (test_chunker_properties.py): word
        // preservation RATIO > 0.8 — word-split boundaries can glue a
        // word to its neighbor, which the reference tolerates too
        val chunkWords = chunks.flatMap(c => PyText.pySplit(c.content)).toSet
        val src = wordsOf(text)
        val kept = src.count(chunkWords.contains)
        assert(kept.toDouble / math.max(src.size, 1) > 0.8,
          s"$ctx: preservation ${kept}/${src.size}")
        // reference property: ≤ 2× size (the word-split safety valve),
        // unless a single unbreakable word exceeds it
        chunks.foreach { c =>
          val maxWord = PyText.pySplit(c.content).map(_.length).maxOption.getOrElse(0)
          assert(c.content.length <= size * 2 || maxWord > size,
            s"$ctx: chunk ${c.content.length} chars exceeds 2x$size")
        }
        // spans index the source
        chunks.foreach(c => assert(c.start >= 0 && c.end <= text.length && c.start <= c.end))
        // determinism
        assert(Chunker.splitTextWithOverlap(text, size, ov) == chunks, s"$ctx: nondeterministic")
      } else assert(chunks.isEmpty, ctx)
    }
  }

  test("splitCharSlices: termination, window bound, char coverage (500 cases)") {
    val r = new Random(777L)
    (0 until 500).foreach { i =>
      val text = randomText(r)
      val size = 16 + r.nextInt(200)
      val ov = r.nextInt(size)
      val ctx = s"case $i size=$size ov=$ov"
      val pieces = Chunker.splitCharSlices(text, size, ov) // must terminate
      if (text.length <= size) assert(pieces == Vector(text), ctx)
      else {
        pieces.foreach(p => assert(p.length <= size, s"$ctx: piece ${p.length} > $size"))
        pieces.foreach(p => assert(PyText.pyStrip(p) == p && p.nonEmpty, s"$ctx: unstripped"))
        // word-preservation ratio (slice boundaries can cut words)
        val pieceWords = pieces.flatMap(PyText.pySplit).toSet
        val src = wordsOf(text).filter(_.length <= size)
        val kept = src.count(pieceWords.contains)
        assert(kept.toDouble / math.max(src.size, 1) > 0.8,
          s"$ctx: preservation ${kept}/${src.size}")
      }
    }
  }

  test("chunkWithStructure and chunkCharSlices: sequential indices, coverage (200 cases)") {
    val r = new Random(4242L)
    (0 until 200).foreach { i =>
      val blocks = (0 until 1 + r.nextInt(8)).map { b =>
        Chunker.Block(randomText(r), r.nextInt(4))
      }
      val nonBlank = blocks.filter(b => PyText.pyStrip(b.text).nonEmpty)
      Seq(Chunker.chunkWithStructure(blocks, 128, 20),
          Chunker.chunkCharSlices(blocks, 128, 20)).foreach { out =>
        assert(out.map(_.chunkIndex) == out.indices.toVector, s"case $i: indices")
        if (nonBlank.nonEmpty && out.nonEmpty) {
          val outWords = out.flatMap(c => PyText.pySplit(c.content)).toSet
          val srcWords = nonBlank.flatMap(b => PyText.pySplit(b.text))
            .filter(w => w.length <= 128).toSet
          val kept = srcWords.count(outWords.contains)
          assert(kept.toDouble / math.max(srcWords.size, 1) > 0.8,
            s"case $i: preservation ${kept}/${srcWords.size}")
        }
      }
    }
  }

  test("tokenizer: scala and column twins agree byte-for-byte (300 cases)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val r = new Random(90125L)
    val texts = (0 until 300).map(_ => randomText(r)) :+ "" :+ "THE of and" :+ "§±€ 🙂"
    val viaScala = texts.map(Tokenizer.tokenize)
    val viaCol = texts.toDF("t")
      .select(graft.retrieval.Retrieval.tokenizeCol(org.apache.spark.sql.functions.col("t")))
      .as[Seq[String]].collect().toSeq
    texts.indices.foreach { i =>
      assert(viaScala(i) == viaCol(i),
        s"case $i [${texts(i).take(60)}]: ${viaScala(i)} vs ${viaCol(i)}")
    }
  }
}
