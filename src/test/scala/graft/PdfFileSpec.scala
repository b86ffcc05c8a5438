package graft

import graft.extract.{Pdf, PdfFile}
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

/** PDF FILE reader: object scan, FlateDecode inflate, page assembly —
  * synthesized real PDF binaries (compressed streams, proper object
  * structure), asserting the file path produces the same text as the
  * inline content-stream path.
  */
class PdfFileSpec extends AnyFunSuite {

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Minimal but structurally real PDF: header, page-tree objects, one
    * compressed content stream per page, trailer.
    */
  private def pdfFile(pageStreams: Seq[String], compress: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"2 0 obj << /Type /Pages /Count ${pageStreams.size} >> endobj\n")
    pageStreams.zipWithIndex.foreach { case (cs, i) =>
      val objNum = 3 + i
      if (compress) {
        val z = deflate(cs)
        w(s"$objNum 0 obj << /Length ${z.length} /Filter /FlateDecode >> stream\n")
        out.write(z)
        w("\nendstream endobj\n")
      } else {
        w(s"$objNum 0 obj << /Length ${cs.length} >> stream\n")
        w(cs)
        w("\nendstream endobj\n")
      }
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  private val page1 =
    "BT /F1 12 Tf 72 720 Td (Repeated Header) Tj 72 700 Td (First page body text.) Tj 72 60 Td (Page 1 of 2) Tj ET"
  private val page2 =
    "BT /F1 12 Tf 72 720 Td (Repeated Header) Tj 72 700 Td (Second page body text.) Tj 72 60 Td (Page 2 of 2) Tj ET"

  test("compressed PDF file round-trips through inflate to the stream extractor") {
    val bytes = pdfFile(Seq(page1, page2))
    assert(PdfFile.looksPdfFile(bytes))
    val text = PdfFile.mainText(bytes)
    assert(text.contains("First page body text."))
    assert(text.contains("Second page body text."))
    // cross-page header/footer suppression applies to file-based pages too
    assert(!text.contains("Repeated Header"))
    assert(!text.contains("Page 1 of 2"))
  }

  test("file path text equals the inline content-stream path text per page") {
    val bytes = pdfFile(Seq(page1))
    val viaFile = PdfFile.extract(bytes).flatMap(_.lines.map(_.text))
    val viaStream = Pdf.extract(page1).flatMap(_.lines.map(_.text))
    assert(viaFile == viaStream)
  }

  test("extractor routes %PDF- prefixed text payloads through the file reader") {
    import graft.extract.Extractor
    val s = new String(pdfFile(Seq(page1, page2)), "ISO-8859-1")
    assert(Extractor.sniff(s) == "pdf_file")
    val ex = Extractor.extract(s)
    assert(ex.kind == "pdf_file" && ex.skipReason == "")
    assert(ex.text.contains("First page body text.") &&
      ex.text.contains("Second page body text."))
    assert(ex.spans.nonEmpty && ex.spans.forall(_.label.startsWith("pdf_file_p")))
    assert(ex.blockLens.sum + ex.blockLens.size - 1 == ex.text.length)
  }

  test("image XObjects: dict metadata, payload, page association, formats") {
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val z = deflate(page1)
    w(s"3 0 obj << /Length ${z.length} /Filter /FlateDecode >> stream\n")
    out.write(z); w("\nendstream endobj\n")
    // raw image after page 1's stream
    w("5 0 obj << /Type /XObject /Subtype /Image /Width 320 /Height 240 /Length 6 >> stream\n")
    w("PIXELS")
    w("\nendstream endobj\n")
    // jpeg (DCT) image — payload passes through verbatim
    w("6 0 obj << /Subtype /Image /Width 64 /Height 48 /Filter /DCTDecode /Length 4 >> stream\n")
    w("JFIF")
    w("\nendstream endobj\n")
    val bytes = out.toByteArray

    val imgs = PdfFile.images(bytes)
    assert(imgs.size == 2)
    val raw = imgs.find(_.format == "raw").get
    assert(raw.width == 320 && raw.height == 240 && raw.page == 0)
    assert(new String(raw.data, "ISO-8859-1") == "PIXELS")
    val jpg = imgs.find(_.format == "jpeg").get
    assert(jpg.width == 64 && jpg.height == 48)
    assert(new String(jpg.data, "ISO-8859-1") == "JFIF")
    // text extraction is unaffected by interleaved image objects
    assert(PdfFile.mainText(bytes).contains("First page body text."))
    // total on garbage
    assert(PdfFile.images("not a pdf".getBytes("ISO-8859-1")).isEmpty)
  }

  test("uncompressed streams and damaged files degrade gracefully") {
    val plain = pdfFile(Seq(page1), compress = false)
    assert(PdfFile.mainText(plain).contains("First page body text."))

    // corrupt the compressed payload: object skipped, no throw
    val bytes = pdfFile(Seq(page1, page2))
    val corrupted = bytes.clone()
    val at = bytes.length / 2
    (at until math.min(at + 40, bytes.length)).foreach(i => corrupted(i) = 0x7f)
    PdfFile.mainText(corrupted) // must not throw
    assert(PdfFile.mainText("not a pdf at all".getBytes("ISO-8859-1")) == "")
    assert(PdfFile.mainText(Array.emptyByteArray) == "")
  }
}
