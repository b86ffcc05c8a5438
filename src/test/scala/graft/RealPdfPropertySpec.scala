package graft

import graft.extract.PdfFile
import org.scalatest.funsuite.AnyFunSuite

/** The reference pins its parser properties on REAL sample PDFs
  * (`tests/test_parser_properties.py:25-57` — Property 5 "text
  * extraction preserves content", `:65-92` — Property 6 "image
  * extraction completeness", `:132-155` — Property 8 "partial failure
  * resilience"; corpus at `data/raw/`, `tests/conftest.py:6-9`). This
  * spec runs the SAME documents through the native extractor — read
  * from the read-only reference checkout and skipped gracefully when
  * absent, exactly like the reference's `pytest.skip("Test PDF not
  * found")`.
  *
  * The corpus exercises what synthetic fixtures cannot: CID/Identity-H
  * subset fonts with ToUnicode CMaps (the Polish WARTA document — see
  * [[graft.extract.CidDecode]]), DCT/Flate image XObjects, a scanned
  * image-only file, and a 20-page academic paper.
  */
class RealPdfPropertySpec extends AnyFunSuite {

  private val rawDir = new java.io.File("/root/reference/data/raw")

  private def pdf(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(new java.io.File(rawDir, name).toPath)

  private def corpus(): Seq[(String, Array[Byte])] = {
    assume(rawDir.isDirectory, "reference sample corpus not present")
    rawDir.listFiles().filter(_.getName.endsWith(".pdf")).sortBy(_.getName)
      .toSeq.map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath))
  }

  test("P5: text extraction preserves content on every sample PDF") {
    val seen = corpus().map { case (name, bytes) =>
      assert(PdfFile.looksPdfFile(bytes), s"$name signature")
      val (pages, nStreams, nFailed) = PdfFile.extractStats(bytes)
      // page indices are dense 0..n-1 (the reference asserts
      // 0 <= block.page < num_pages)
      assert(pages.map(_.page) == pages.indices.toVector, name)
      // every emitted line carries content (len(block.content) > 0)
      pages.foreach(p => p.lines.foreach(l => assert(l.text.nonEmpty, name)))
      assert(nFailed == 0, s"$name: $nFailed of $nStreams streams failed")
      (name, pages.nonEmpty)
    }
    // 6 of the 7 samples carry a text layer; only the scanned
    // ocrInput.pdf is image-only
    assert(seen.count(_._2) >= 6, seen.toString)
    assert(!seen.toMap.apply("ocrInput.pdf"))
  }

  test("P5: CID/Identity-H fonts decode through ToUnicode CMaps") {
    assume(rawDir.isDirectory)
    val text = PdfFile.mainText(pdf(
      "WARTA_OWU_AutoCasco_Standard_ACS_C6201_IPID_dla_umow_zawieranych_do_31.03.2022.pdf"))
    assert(text.length > 10000)
    val printable = text.count(c =>
      c.isLetterOrDigit || c.isWhitespace || ".,;:!?()-/%„”§".contains(c))
    assert(printable.toDouble / text.length > 0.95,
      s"printable ratio ${printable.toDouble / text.length}")
    // real Polish insurance vocabulary, not glyph-code garbage
    val lower = text.toLowerCase
    assert(lower.contains("ubezpiecz"), "missing 'ubezpiecz*'")
    assert(lower.contains("pojazd"), "missing 'pojazd'")
    // decoded diacritics arrive as real Unicode, not Latin-1 bytes
    assert(text.exists(c => "ąćęłńóśźż".contains(c)), "no Polish diacritics")
  }

  test("P5: simple-font documents extract real English text") {
    assume(rawDir.isDirectory)
    assert(PdfFile.mainText(pdf("1512.03385v1.pdf")).toLowerCase
      .contains("residual"))
    assert(PdfFile.mainText(pdf("pdfPropertiesInput.pdf")).toLowerCase
      .contains("vendor"))
  }

  test("P6: image extraction completeness — metadata valid on every image") {
    corpus().foreach { case (name, bytes) =>
      val pages = PdfFile.extract(bytes)
      PdfFile.images(bytes).foreach { img =>
        assert(img.data.nonEmpty, name)
        assert(img.width >= 0 && img.height >= 0, name)
        assert(Set("jpeg", "jpeg2000", "raw", "corrupt")(img.format), name)
        assert(img.page >= 0 && img.page <= math.max(pages.size - 1, 0), name)
        if (img.format == "jpeg")
          assert((img.data(0) & 0xFF) == 0xFF && (img.data(1) & 0xFF) == 0xD8,
            s"$name: DCT payload lacks JPEG SOI")
      }
    }
  }

  test("P6: the scanned sample yields its page scans as JPEG objects") {
    assume(rawDir.isDirectory)
    val imgs = PdfFile.images(pdf("ocrInput.pdf"))
    assert(imgs.nonEmpty)
    assert(imgs.forall(_.format == "jpeg"))
    assert(imgs.forall(i => i.width > 0 && i.height > 0))
  }

  test("P8: partial failure resilience — non-PDF and corrupted bytes") {
    // non-PDF bytes: rejected by signature, extraction total and empty
    val notPdf = "Not a PDF".getBytes("ISO-8859-1")
    assert(!PdfFile.looksPdfFile(notPdf))
    assert(PdfFile.extract(notPdf).isEmpty)
    // a real file with a corrupted interior must not throw
    assume(rawDir.isDirectory)
    val bytes = pdf("1512.03385v1.pdf")
    var i = bytes.length / 3
    while (i < 2 * bytes.length / 3) { bytes(i) = 0; i += 7 }
    PdfFile.mainText(bytes) // survives; content is best-effort
    // truncation must not throw either
    PdfFile.mainText(java.util.Arrays.copyOf(pdf("Bodea Brochure.pdf"), 40000))
  }
}
