package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.text.Chunker

/** Differential fuzz vs CPython re.split of the reference pattern
  * (pieces BEFORE filtering/space-append — reconstructed from the
  * Sentence offsets is not possible post-filter, so re-derive the raw
  * piece boundaries with the same scan and compare).
  */
class SentenceSplitFuzzSpec extends AnyFunSuite {
  test("hand-rolled sentence scan matches CPython re.split on 3k fuzz cases") {
    val src = scala.io.Source.fromInputStream(getClass.getResourceAsStream("/golden/sentence_fuzz.json"), "UTF-8").mkString
    // minimal JSON parse (strings contain escapes) via ujson? none — use regex-free manual:
    // the file is [{"text": ..., "pieces": [...]}, ...] — use Spark's JSON? simplest: scala.util.parsing? none.
    // Use Jackson from Spark's classpath.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(src)
    var checked = 0
    (0 until root.size()).foreach { i =>
      val node = root.get(i)
      val text = node.get("text").asText()
      val expected = (0 until node.get("pieces").size())
        .map(j => node.get("pieces").get(j).asText()).toVector
      // reconstruct raw pieces from the kept sentences is lossy; instead
      // verify via the public API against the same post-processing of
      // CPython's pieces (strip-filter + space-append + fallback)
      val pyKept = expected.flatMap { raw =>
        if (graft.text.PyText.pyStrip(raw).nonEmpty) {
          val t = if (raw.endsWith(" ") || raw.endsWith("\n") || raw.endsWith("\t")) raw else raw + " "
          Some(t)
        } else None
      }
      val pyFinal =
        if (pyKept.isEmpty && graft.text.PyText.pyStrip(text).nonEmpty) Vector(text)
        else pyKept
      val got = Chunker.splitIntoSentences(text).map(_.text)
      assert(got == pyFinal, s"text=${text.replace("\n","\\n").replace("\t","\\t")}")
      checked += 1
    }
    assert(checked > 3000)
  }
}
