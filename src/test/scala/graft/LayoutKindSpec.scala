package graft

import graft.extract.{Extractor, Html, Pdf}
import org.scalatest.funsuite.AnyFunSuite

/** S4 layout-kind tagging parity (reference `adobe_pdf_parser.py:192-201`:
  * headings, lists, titles classified from document structure).
  */
class LayoutKindSpec extends AnyFunSuite {

  test("html: li blocks are tagged list, headings stay heading") {
    val html =
      """<html><body><article><h2>Section Heading Here</h2>
        |<p>A paragraph with enough words to be kept by the classifier as main
        |content of this little document it keeps going and going.</p>
        |<ul><li>first item with several plain words inside it</li>
        |<li>second item also containing several plain words</li></ul>
        |</article></body></html>""".stripMargin
    val res = Html.extract(html)
    val kinds = res.blocks.map(b => b.kind -> b.text).toMap
    assert(res.blocks.exists(_.kind == "list"), s"want a list block in ${res.blocks}")
    assert(res.blocks.exists(_.kind == "heading"))
    assert(kinds.collect { case ("list", t) => t }.forall(_.contains("item")))
  }

  test("pdf: display-size first-page line is title, bullets are list") {
    val src =
      """%%Page: 1
        |BT
        |/F1 24 Tf
        |1 0 0 1 72.0 750.0 Tm
        |(The Document Title) Tj
        |/F1 12 Tf
        |1 0 0 1 72.0 700.0 Tm
        |(Body text line one of the document goes here.) Tj
        |1 0 0 1 72.0 680.0 Tm
        |(Body text line two with more words follows.) Tj
        |1 0 0 1 90.0 640.0 Tm
        |(• bullet item one) Tj
        |1 0 0 1 90.0 620.0 Tm
        |(- dashed item two) Tj
        |ET""".stripMargin
    val pages = Pdf.extract(src)
    val lines = pages.flatMap(_.lines)
    val kinds = Pdf.lineKinds(lines)
    val byText = lines.map(_.text).zip(kinds).toMap
    assert(byText("The Document Title") == "title")
    assert(byText.filter(_._1.startsWith("Body")).values.forall(_ == "text"))
    assert(byText.collect { case (t, k) if t.contains("item") => k }
      .forall(_ == "list"))
  }

  test("extractor spans carry layout-kind suffixes and stay page-parseable") {
    val src =
      """%%Page: 1
        |BT
        |/F1 24 Tf
        |1 0 0 1 72.0 750.0 Tm
        |(Big Title Line) Tj
        |/F1 12 Tf
        |1 0 0 1 72.0 700.0 Tm
        |(Ordinary body text sentence for the page.) Tj
        |ET""".stripMargin
    val ex = Extractor.extract(src)
    assert(ex.kind == "pdf")
    assert(ex.spans.exists(_.label == "pdf_line_p0:title"), ex.spans.map(_.label))
    assert(ex.spans.exists(_.label == "pdf_line_p0"))
    // page parsing in rebuildBlocks tolerates the suffix
    val blocks = graft.pipeline.ExtractionPipeline.rebuildBlocks(
      ex.text, ex.blockLens.toArray, ex.spans.map(_.label).toArray)
    assert(blocks.forall(_.page == 0))
  }
}
