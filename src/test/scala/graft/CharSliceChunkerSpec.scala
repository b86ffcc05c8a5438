package graft

import graft.text.Chunker
import graft.text.Chunker.Block
import org.scalatest.funsuite.AnyFunSuite

/** Byte-for-byte parity of the F7 char-slice chunker against goldens
  * generated from the reference's ALTERNATE chunker
  * (`app/processing/multimodal/multimodal_chunker.py:57-143`) — a
  * different algorithm from the main sentence-packing chunker (F4).
  */
class CharSliceChunkerSpec extends AnyFunSuite {

  test("char-slice split matches the reference on the golden corpus") {
    val root = Golden.load("charslice_cases.json")
    val cases = Golden.elems(root.get("texts"))
    assert(cases.nonEmpty)
    var nPieces = 0
    cases.foreach { c =>
      val id = c.get("id").asText()
      val text = c.get("text").asText()
      Golden.elems(c.get("params")).foreach { p =>
        val size = p.get("size").asInt()
        val ov = p.get("overlap").asInt()
        // pieces == null marks a combo where the REFERENCE does not
        // terminate (separator at the window head oscillates `start`);
        // our port forces forward progress there — no golden to match
        if (!p.get("pieces").isNull) {
          val got =
            if (text.isEmpty) Vector.empty[String]
            else Chunker.splitCharSlices(text, size, ov)
          assert(got == Golden.strings(p.get("pieces")),
            s"[$id size=$size ov=$ov] pieces")
          nPieces += got.size
        } else {
          // the port must still terminate and cover the text
          val got = Chunker.splitCharSlices(text, size, ov)
          assert(got.nonEmpty)
        }
      }
    }
    assert(nPieces > 50, "golden corpus should exercise many pieces")
  }

  test("per-block char-slice chunking matches the reference create_text_chunks") {
    val root = Golden.load("charslice_cases.json")
    val cases = Golden.elems(root.get("blocks"))
    assert(cases.nonEmpty)
    cases.foreach { c =>
      val id = c.get("id").asText()
      val blocks = Golden.elems(c.get("blocks")).map(b =>
        Block(b.get("text").asText(), b.get("page").asInt()))
      val golden = Golden.elems(c.get("chunks"))
      val got = Chunker.chunkCharSlices(blocks)
      assert(got.size == golden.size, s"[$id] chunk count")
      got.zip(golden).foreach { case (g, ex) =>
        val ctx = s"[$id idx=${g.chunkIndex}]"
        assert(g.content == ex.get("content").asText(), s"$ctx content")
        assert(g.page == ex.get("page").asInt(), s"$ctx page")
        assert(g.chunkIndex == ex.get("chunk_index").asInt(), s"$ctx index")
      }
    }
  }

  test("forward progress on adversarial separator placement") {
    // separator at the window head: the reference's `start = end - overlap`
    // would step backward (negative Python slice); ours documents and
    // forces forward progress instead of looping
    val text = ". " + "a" * 600
    val got = Chunker.splitCharSlices(text, 512, 50)
    assert(got.nonEmpty)
    assert(got.forall(_.nonEmpty))
    // every input char (modulo stripped ws) appears across pieces
    assert(got.mkString.count(_ == 'a') >= 600)
  }

  test("short text returns verbatim; oversized pieces never exceed window") {
    assert(Chunker.splitCharSlices("small text", 512, 50) == Vector("small text"))
    val long = ("Word soup with no separators " * 40).trim
    val pieces = Chunker.splitCharSlices(long, 100, 10)
    assert(pieces.forall(_.length <= 100))
  }
}
