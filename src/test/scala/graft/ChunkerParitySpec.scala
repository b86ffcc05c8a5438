package graft

import graft.text.Chunker
import graft.text.Chunker.Block
import org.scalatest.funsuite.AnyFunSuite

/** Byte-for-byte parity of the chunker against goldens generated from the
  * reference implementation (`app/processing/chunker.py`).
  */
class ChunkerParitySpec extends AnyFunSuite {

  test("sentence split, overlap-split, strip, and overlap-tail match the reference") {
    val cases = Golden.elems(Golden.load("chunker_cases.json"))
    assert(cases.nonEmpty)
    var nChunks = 0
    cases.foreach { c =>
      val id = c.get("id").asText()
      val text = c.get("text").asText()
      Golden.elems(c.get("params")).foreach { p =>
        val size = p.get("size").asInt()
        val ov = p.get("overlap").asInt()
        val ctx = s"[$id size=$size ov=$ov]"

        val gotSentences =
          if (text.isEmpty) Vector.empty[String]
          else Chunker.splitIntoSentences(text).map(_.text)
        assert(gotSentences == Golden.strings(p.get("sentences")), s"$ctx sentences")

        val gotChunks = Chunker.splitTextWithOverlap(text, size, ov).map(_.content)
        assert(gotChunks == Golden.strings(p.get("chunks")), s"$ctx chunks")
        assert(gotChunks.map(graft.text.PyText.pyStrip) ==
          Golden.strings(p.get("stripped")), s"$ctx stripped")
        nChunks += gotChunks.size

        if (text.nonEmpty) {
          assert(Chunker.overlapText(text, ov) == p.get("overlap_text").asText(),
            s"$ctx overlap_text")
        }
      }
    }
    assert(nChunks > 100, "golden corpus should exercise many chunks")
  }

  test("structure-aware and flat document chunking match the reference") {
    val cases = Golden.elems(Golden.load("structure_cases.json"))
    assert(cases.nonEmpty)
    cases.foreach { c =>
      val id = c.get("id").asText()
      val size = c.get("size").asInt()
      val ov = c.get("overlap").asInt()
      val blocks = Golden.elems(c.get("blocks")).map(b =>
        Block(b.get("text").asText(), b.get("page").asInt()))
      val golden = Golden.elems(c.get("chunks"))
      val flat = id.endsWith("__flat")
      val got =
        if (flat) Chunker.chunkDocument(blocks, size, ov)
        else Chunker.chunkWithStructure(blocks, size, ov)
      assert(got.size == golden.size, s"[$id] chunk count")
      got.zip(golden).foreach { case (g, ex) =>
        val ctx = s"[$id size=$size idx=${g.chunkIndex}]"
        assert(g.content == ex.get("content").asText(), s"$ctx content")
        assert(g.chunkIndex == ex.get("chunk_index").asInt(), s"$ctx index")
        assert(g.rawLength == ex.get("chunk_length").asInt(), s"$ctx length")
        if (!flat) {
          assert(g.page == ex.get("page").asInt(), s"$ctx page")
          assert(g.sectionBoundary == ex.get("section_boundary").asBoolean(), s"$ctx boundary")
          val exHeading =
            if (ex.get("section_heading").isNull) None
            else Some(ex.get("section_heading").asText())
          assert(g.sectionHeading == exHeading, s"$ctx heading")
        }
      }
    }
  }

  test("heading detection matches the reference") {
    Golden.elems(Golden.load("heading_cases.json")).foreach { c =>
      val text = c.get("text").asText()
      assert(Chunker.isLikelyHeading(text) == c.get("is_heading").asBoolean(),
        s"heading [$text]")
    }
  }

  test("astral arithmetic counts code points (incl. lone surrogates)") {
    // two sentences of 26 astral pairs each: 27 code points / 53 UTF-16
    // units per sentence (incl. cap + punct + synthetic space). Python
    // packs both into one 60-cp chunk; UTF-16 arithmetic (106 > 60)
    // would wrongly flush between them.
    val s1 = "A" + "🚀" * 26 + "."
    val s2 = "B" + "🌍" * 26 + "."
    val both = s1 + " " + s2
    val packed = Chunker.splitTextWithOverlap(both, 60, 10)
    assert(packed.size == 1, "code-point packing should keep both sentences")
    assert(packed.head.content == s1 + " " + s2 + " ")

    // a lone surrogate counts as ONE code point (CPython round-trip
    // behavior) — it cannot ride the JSON goldens, so pinned here
    assert(graft.text.PyText.cpLen("a\ud800b") == 3)
    assert(graft.text.PyText.hasSurrogate("a\ud800b"))

    // overlap tail slices the last `overlap` CODE POINTS, never
    // splitting a surrogate pair
    val tail = Chunker.overlapText("word 🚀🌍🔥🎉🧠", 4)
    assert(tail == "🚀🌍🔥🎉🧠".substring("🚀🌍🔥🎉🧠".offsetByCodePoints(0, 1)))
    assert(!tail.exists(c => Character.isHighSurrogate(c) &&
      tail.indexOf(c) == tail.length - 1))
  }

  test("spans index real source content") {
    val text = "First sentence here. Second one follows! Third sentence now? " * 20
    val chunks = Chunker.splitTextWithOverlap(text, 100, 20)
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      assert(c.start >= 0 && c.end <= text.length && c.start < c.end)
      // the span's source slice must appear inside the chunk content
      // (chunk = optional overlap prefix + packed sentences + synthetic spaces)
      val slice = text.substring(c.start, c.end)
      assert(slice.split("\\s+").forall(w => c.content.contains(w)))
    }
    // spans are non-decreasing and cover the text
    assert(chunks.map(_.start) == chunks.map(_.start).sorted)
    assert(chunks.head.start == 0 && chunks.last.end == text.length)
  }
}
