package graft

import graft.extract.{Extractor, Pdf}
import org.scalatest.funsuite.AnyFunSuite

class PdfExtractorSpec extends AnyFunSuite {

  test("literal string escapes, hex strings, Tj/TJ") {
    val src =
      """BT /F1 12 Tf
        |1 0 0 1 72 700 Tm (Hello \(world\) \\ line) Tj
        |1 0 0 1 72 680 Tm <48692121> Tj
        |1 0 0 1 72 660 Tm [(kern) -250 (space) -20 (tight)] TJ
        |ET""".stripMargin
    val text = Pdf.mainText(src)
    assert(text.contains("Hello (world) \\ line"))
    assert(text.contains("Hi!!"))
    // -250 ≤ -180 inserts a space; -20 does not
    assert(text.contains("kern spacetight"))
  }

  test("octal escapes and line continuation") {
    val src = "BT 1 0 0 1 72 700 Tm (A\\101B\\\nC) Tj ET"
    assert(Pdf.mainText(src) == "AABC")
  }

  test("out-of-order draw commands are re-ordered by y then x") {
    val src =
      """BT /F1 12 Tf
        |1 0 0 1 72 600 Tm (third line) Tj
        |1 0 0 1 72 700 Tm (first line) Tj
        |1 0 0 1 72 650 Tm (second line) Tj
        |ET""".stripMargin
    assert(Pdf.mainText(src) == "first line\nsecond line\nthird line")
  }

  test("same-baseline items join with gap-aware spacing") {
    val src =
      """BT /F1 12 Tf
        |1 0 0 1 104 700 Tm (right) Tj
        |1 0 0 1 72 700 Tm (left) Tj
        |ET""".stripMargin
    assert(Pdf.mainText(src) == "left right")
  }

  test("Td/TD/T* relative positioning builds successive lines") {
    val src =
      """BT /F1 12 Tf 14 TL
        |72 700 Td (one) Tj
        |0 -16 Td (two) Tj
        |T* (three) Tj
        |ET""".stripMargin
    assert(Pdf.mainText(src) == "one\ntwo\nthree")
  }

  test("x-y cut: two-column layout reads left column before right") {
    val src =
      """BT /F1 12 Tf
        |1 0 0 1 72 700 Tm (L1) Tj
        |1 0 0 1 320 700 Tm (R1) Tj
        |1 0 0 1 72 684 Tm (L2) Tj
        |1 0 0 1 320 684 Tm (R2) Tj
        |1 0 0 1 72 668 Tm (L3) Tj
        |1 0 0 1 320 668 Tm (R3) Tj
        |ET""".stripMargin
    assert(Pdf.mainText(src) == "L1\nL2\nL3\nR1\nR2\nR3")
  }

  test("header/footer suppression across pages, digit normalization") {
    def page(n: Int, body: String) =
      s"""%%Page: $n
         |BT /F1 12 Tf
         |1 0 0 1 72 780 Tm (ANNUAL REPORT) Tj
         |$body
         |1 0 0 1 72 30 Tm (Page $n of 3) Tj
         |ET""".stripMargin
    val src = Seq(
      page(1, "1 0 0 1 72 500 Tm (alpha body one) Tj"),
      page(2, "1 0 0 1 72 500 Tm (beta body two) Tj"),
      page(3, "1 0 0 1 72 500 Tm (gamma body three) Tj")).mkString("\n")
    val text = Pdf.mainText(src)
    assert(!text.contains("ANNUAL REPORT"))
    assert(!text.contains("Page 1"))
    assert(text.contains("alpha body one"))
    assert(text.contains("beta body two"))
    assert(text.contains("gamma body three"))
  }

  test("single page keeps would-be headers (no cross-page evidence)") {
    val src =
      """BT /F1 12 Tf
        |1 0 0 1 72 780 Tm (TITLE LINE) Tj
        |1 0 0 1 72 400 Tm (body content here) Tj
        |ET""".stripMargin
    val text = Pdf.mainText(src)
    assert(text.contains("TITLE LINE"))
  }

  test("spans index the source stream") {
    val src = "BT 1 0 0 1 72 700 Tm (find me here) Tj ET"
    val pages = Pdf.extract(src)
    val l = pages.head.lines.head
    assert(src.substring(l.start, l.end) == "(find me here)")
  }

  test("sniffer dispatch: pdf vs html vs plain") {
    assert(Extractor.sniff("BT (x) Tj ET") == "pdf")
    assert(Extractor.sniff("<html><body><p>x</p></body></html>") == "html")
    assert(Extractor.sniff("Just a plain sentence. And another.") == "plain")
    assert(Extractor.sniff("") == "plain")
    // mentions of BT without a text object stay plain
    assert(Extractor.sniff("the BT operator is neat") == "plain")
  }

  test("extractor total on malformed input") {
    val ex = Extractor.extract("BT (unclosed Tj ET")
    assert(ex.kind == "pdf" || ex.kind == "plain")
    val ex2 = Extractor.extract("<table><tr><td>never closed")
    assert(ex2.kind == "html")
  }
}
