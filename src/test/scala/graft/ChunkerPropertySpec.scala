package graft

import graft.text.{Chunker, PyText}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's Hypothesis chunker properties
  * (rafalpronko/pdf-parser `tests/test_chunker_properties.py`):
  *  - P9 content preservation: word-preservation ratio > 0.8, every chunk
  *    ≤ 2× chunk_size, ≥ 1 chunk for non-blank input (`:72-195`)
  *  - sequential chunk indices (`:151-166`)
  *  - P10 boundary integrity: no mid-word splits for texts whose
  *    sentences fit the chunk budget (`:198-316`)
  *  - P12 structure-aware: headings preserved, section boundaries
  *    flagged (`:462-610`)
  *
  * Generators mirror the reference's `text_content()` strategy
  * (5–20 words/sentence, 1–50 sentences, `test_chunker_properties.py:11-29`).
  */
class ChunkerPropertySpec extends AnyFunSuite {

  /** Deterministic sampling (no scalatestplus bridge in the offline
    * cache): fixed seeds, reproducible failures.
    */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  private val word = Gen.choose(2, 9).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaLowerChar))
  private val sentence = for {
    n <- Gen.choose(5, 20)
    ws <- Gen.listOfN(n, word)
    p <- Gen.oneOf(".", "!", "?")
  } yield ws.mkString(" ").capitalize + p
  private val textContent = for {
    n <- Gen.choose(1, 50)
    ss <- Gen.listOfN(n, sentence)
  } yield ss.mkString(" ")

  test("P9: content preserved, sizes bounded, at least one chunk") {
    samples(textContent, 60).foreach { text =>
      val chunks = Chunker.splitTextWithOverlap(text, 512, 50)
      assert(chunks.nonEmpty)
      // every chunk within the 2x safety bound
      assert(chunks.forall(_.content.length <= 2 * 512))
      // word preservation: >80% of source words appear in some chunk
      val srcWords = PyText.pySplit(text).toSet
      val outWords = chunks.flatMap(c => PyText.pySplit(c.content)).toSet
      val preserved = srcWords.count(outWords.contains)
      assert(preserved.toDouble / math.max(srcWords.size, 1) > 0.8)
    }
  }

  test("P9: sequential chunk indices from chunkDocument") {
    samples(textContent, 30).foreach { text =>
      val chunks = Chunker.chunkDocument(
        Seq(Chunker.Block(text, 0)), 256, 32)
      assert(chunks.map(_.chunkIndex) == chunks.indices.toVector)
    }
  }

  test("P10: no mid-word splits when sentences fit the budget") {
    samples(textContent, 60).foreach { text =>
      val srcWords = PyText.pySplit(text).map(w =>
        w.filter(_.isLetter)).filter(_.nonEmpty).toSet
      val chunks = Chunker.splitTextWithOverlap(text, 512, 50)
      chunks.foreach { c =>
        PyText.pySplit(c.content).map(_.filter(_.isLetter)).filter(_.nonEmpty)
          .foreach(w => assert(srcWords.contains(w),
            s"chunk emitted fragment '$w' not a source word"))
      }
    }
  }

  test("P10: overlap tail starts at a word boundary") {
    samples(textContent, 40).foreach { text =>
      val tail = Chunker.overlapText(text, 50)
      if (tail.length < text.length && tail.nonEmpty) {
        val idx = text.length - tail.length
        // reference semantics (`chunker.py:336-368`): the tail restarts
        // after ". "/"! "/"? " or the first space — so the char before it
        // is a space — EXCEPT the quirk where the 50-char window begins
        // with a space (indexOf == 0 fails the > 0 guard and the raw tail
        // is kept, leading-space included)
        assert(idx == 0 || text.charAt(idx - 1) == ' ' || tail.charAt(0) == ' ')
      }
    }
  }

  test("P12: structure-aware chunking preserves headings and flags sections") {
    val blocks = Seq(
      Chunker.Block("INTRODUCTION", 0),
      Chunker.Block(textGen(40), 0),
      Chunker.Block("2. Methods And Materials", 1),
      Chunker.Block(textGen(40), 1))
    val chunks = Chunker.chunkWithStructure(blocks, 512, 50)
    assert(chunks.exists(_.sectionHeading.contains("INTRODUCTION")))
    assert(chunks.exists(_.sectionHeading.contains("2. Methods And Materials")))
    assert(chunks.head.sectionBoundary)
    assert(chunks.map(_.chunkIndex) == chunks.indices.toVector)
  }

  test("spans always index real source content") {
    samples(textContent, 40).foreach { text =>
      Chunker.splitTextWithOverlap(text, 256, 32).foreach { c =>
        assert(c.start >= 0 && c.end <= text.length && c.start <= c.end)
        // the span's source slice shares its first word with the chunk's
        // first non-overlap content
        val slice = text.substring(c.start, c.end)
        assert(PyText.pyStrip(slice).nonEmpty)
      }
    }
  }

  private def textGen(words: Int): String =
    (1 to words).map(i => s"word$i").mkString(" ") + "."
}
