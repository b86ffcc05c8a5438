package graft

import graft.extract.{CidDecode, PdfFile}
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the ToUnicode CMap layer (PDF 32000-1 §9.10.3)
  * feeding [[graft.extract.PdfFile.decodedContentStreams]].
  */
class CidDecodeSpec extends AnyFunSuite {

  test("parseCmap: bfchar, scalar bfrange, array bfrange, mixed code widths") {
    val cm = CidDecode.parseCmap(
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |3 beginbfchar
        |<01> <0041>
        |<0102> <0142>
        |<03> <00660066>
        |endbfchar
        |2 beginbfrange
        |<10> <12> <0061>
        |<2000> <2001> [<0058> <0059>]
        |endbfrange""".stripMargin)
    assert(cm.map1(0x01) == "A")
    assert(cm.map2(0x0102) == "ł") // 2-byte source despite 1-byte neighbors
    assert(cm.map1(0x03) == "ff") // multi-char (ligature) destination
    assert(cm.map1(0x10) == "a" && cm.map1(0x11) == "b" && cm.map1(0x12) == "c")
    assert(cm.map2(0x2000) == "X" && cm.map2(0x2001) == "Y")
  }

  test("remap: greedy 1-byte first, 2-byte fallback, identity on misses") {
    val cm = CidDecode.CMap(Map(0x01 -> "a"), Map(0x0203 -> "b"))
    assert(CidDecode.remap("", cm) == "aba")
    // unmapped bytes stay themselves (partial font subsets)
    assert(CidDecode.remap("Z", cm) == "aZ")
  }

  test("rewrite: literal and hex strings remap only under a CMap font") {
    val fonts = Map("C2_0" -> CidDecode.CMap(Map(0x01 -> "H", 0x02 -> "i"), Map.empty))
    val in = "BT /F1 10 Tf (plain) Tj /C2_0 10 Tf () Tj <0102> Tj ET"
    val outS = CidDecode.rewrite(in, fonts)
    assert(outS.contains("(plain)")) // non-CMap font untouched
    assert(outS.contains("(Hi) Tj (Hi) Tj")) // literal and hex both decoded
  }

  test("rewrite: q/Q restores the active font") {
    val fonts = Map("C" -> CidDecode.CMap(Map(0x01 -> "X"), Map.empty))
    val in = "/C 9 Tf q /F1 9 Tf () Tj Q () Tj"
    val outS = CidDecode.rewrite(in, fonts)
    // inside q..Q the plain font is active (string kept raw); after Q
    // the CMap font is restored
    assert(outS.endsWith("(X) Tj"))
    assert(outS.contains("() Tj Q"))
  }

  test("rewrite: no CMap fonts in play round-trips the stream unchanged") {
    val in = "BT /F1 10 Tf [(a\\(b) -200 (c)] TJ <48656C6C6F> Tj << /K (v) >> ET % note (x)"
    assert(CidDecode.rewrite(in, Map("ZZ" -> CidDecode.CMap(Map(1 -> "q"), Map.empty))) == in)
  }

  test("decodedContentStreams: files without /ToUnicode take the plain path") {
    // a synthetic fixture from PdfFileSpec's world: no CMaps anywhere
    val body = "BT /F1 12 Tf 72 720 Td (First page body text.) Tj ET"
    val pdfBytes = ("%PDF-1.4\n1 0 obj\n<< /Length " + body.length +
      " >>\nstream\n" + body + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfFile.decodedContentStreams(pdfBytes) == PdfFile.contentStreams(pdfBytes))
  }

  test("parseObjStm: expands packed dicts; tolerant of damaged headers") {
    val b1 = "<< /Type /Page /Contents 9 0 R >>"
    val b2 = "<< /Type /Font /ToUnicode 7 0 R >>"
    val header = "4 0 5 " + b1.length
    val payload = header + b1 + b2
    val dict = s"<< /Type /ObjStm /N 2 /First ${header.length} >>"
    val out = CidDecode.parseObjStm(dict, payload)
    assert(out == Seq(4 -> b1, 5 -> b2))
    // damage: offset past payload, missing /First, zero /N — no throw
    assert(CidDecode.parseObjStm("<< /ObjStm /N 2 /First 9999 >>", payload).isEmpty)
    assert(CidDecode.parseObjStm("<< /ObjStm /N 2 >>", payload).isEmpty)
    assert(CidDecode.parseObjStm("<< /ObjStm /N 0 /First 4 >>", payload).isEmpty)
    assert(CidDecode.parseObjStm(dict, "1 2").isEmpty)
  }

  test("CID decode resolves page/font dicts packed in a Flate ObjStm (PDF 1.5+)") {
    def deflate(s: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    // object graph: page(4) -> contents(9) + resources font C1 -> font(5)
    // -> ToUnicode(7); page + font dicts live INSIDE the ObjStm(3)
    val pageBody = "<< /Type /Page /Contents 9 0 R /Resources << /Font << /C1 5 0 R >> >> >>"
    val fontBody = "<< /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >>"
    val header = s"4 0 5 ${pageBody.length}"
    val stmPayload = header + pageBody + fontBody
    val packed = deflate(stmPayload.getBytes("ISO-8859-1"))
    val cmap = ("/CIDInit 1 begincodespacerange <00> <FF> endcodespacerange\n" +
      "2 beginbfchar <01> <0048> <02> <0069> endbfchar endcmap").getBytes("ISO-8859-1")
    val content = "BT /C1 12 Tf 72 720 Td () Tj ET".getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"3 0 obj\n<< /Type /ObjStm /N 2 /First ${header.length} /Filter /FlateDecode /Length ${packed.length} >>\nstream\n")
    bos.write(packed); w("\nendstream\nendobj\n")
    w(s"7 0 obj\n<< /Length ${cmap.length} >>\nstream\n")
    bos.write(cmap); w("\nendstream\nendobj\n")
    w(s"9 0 obj\n<< /Length ${content.length} >>\nstream\n")
    bos.write(content); w("\nendstream\nendobj\n%%EOF")
    val text = PdfFile.mainText(bos.toByteArray)
    assert(text == "Hi", s"expected CID-decoded 'Hi', got '$text'")
  }

  test("total on hostile input: binary garbage, truncated cmaps, cyclic refs") {
    val junk = Array.tabulate[Byte](4096)(i => ((i * 31 + 7) & 0xFF).toByte)
    PdfFile.decodedContentStreams(junk)
    CidDecode.parseCmap("beginbfchar <01 endbfchar beginbfrange <00> endbfrange")
    CidDecode.objectBodies("1 0 obj << /Resources 1 0 R /ToUnicode 1 0 R >> endobj")
    val selfRef = ("%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R " +
      "/Resources << /Font << /F1 1 0 R >> >> /ToUnicode 1 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Length 20 >>\nstream\nBT /F1 1 Tf (x) Tj ET\nendstream\nendobj\n")
      .getBytes("ISO-8859-1")
    PdfFile.decodedContentStreams(selfRef)
  }
}
