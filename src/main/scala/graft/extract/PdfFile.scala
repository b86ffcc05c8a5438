package graft.extract

import java.util.zip.Inflater

/** Reader for actual PDF FILES (binary, with object structure and
  * FlateDecode-compressed streams) — the payload the reference accepts
  * on upload (`app/storage/file_storage.py:35-74` validates
  * `application/pdf` bytes; parsing is delegated to MinerU/Adobe/GPT-4o).
  * Ours feeds the decompressed page content streams into the SAME native
  * content-stream extractor ([[Pdf]]), so file-based and inline-stream
  * turns share one golden-locked text path.
  *
  * Deliberately xref-free: a linear `N M obj … endobj` scan tolerates
  * broken/missing cross-reference tables (real-world PDFs are routinely
  * damaged; the xref is an optimization, not the data). Streams whose
  * dict declares `/FlateDecode` are inflated with `java.util.zip`;
  * streams that then look like text content (`BT … ET`) become pages in
  * file order. Total: malformed objects or bad zlib data are skipped,
  * never thrown.
  */
object PdfFile {

  /** Raw object stream: its dictionary source and payload bytes. */
  final case class RawStream(objNum: Int, dict: String, data: Array[Byte])

  private val ObjMarker = "obj".getBytes("ISO-8859-1")

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n' || b == '\f' || b == 0

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    val n = hay.length - needle.length
    while (i <= n) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Linear scan for `N M obj … endobj` object streams. */
  def objects(bytes: Array[Byte]): Vector[RawStream] = {
    val out = Vector.newBuilder[RawStream]
    var i = 0
    while (i >= 0 && i < bytes.length) {
      i = indexOf(bytes, ObjMarker, i)
      if (i >= 0) {
        // word-bounded "obj" preceded by "N M " (generation + object num)
        val okRight = i + 3 >= bytes.length || isWs(bytes(i + 3)) || bytes(i + 3) == '<'
        var k = i - 1
        while (k >= 0 && isWs(bytes(k))) k -= 1
        val genEnd = k
        while (k >= 0 && isDigit(bytes(k))) k -= 1
        val genOk = k < genEnd
        val afterNum = k
        while (k >= 0 && isWs(bytes(k))) k -= 1
        val numEnd = k
        while (k >= 0 && isDigit(bytes(k))) k -= 1
        val numOk = k < numEnd && k < afterNum
        if (okRight && genOk && numOk) {
          val objNum = new String(bytes, k + 1, numEnd - k, "ISO-8859-1").trim
            .toIntOption.getOrElse(-1)
          val end = indexOf(bytes, "endobj".getBytes("ISO-8859-1"), i)
          val bodyEnd = if (end < 0) bytes.length else end
          // dict = text up to `stream` keyword (or whole body)
          val sIdx = indexOf(bytes, "stream".getBytes("ISO-8859-1"), i + 3) match {
            case s if s >= 0 && s < bodyEnd => s
            case _ => -1
          }
          if (sIdx >= 0) {
            val dict = new String(bytes, i + 3, sIdx - (i + 3), "ISO-8859-1")
            // payload starts after `stream` + EOL
            var ds = sIdx + 6
            if (ds < bytes.length && bytes(ds) == '\r') ds += 1
            if (ds < bytes.length && bytes(ds) == '\n') ds += 1
            val eIdx = indexOf(bytes, "endstream".getBytes("ISO-8859-1"), ds)
            val de = if (eIdx < 0 || eIdx > bodyEnd) bodyEnd else eIdx
            if (de > ds)
              out += RawStream(objNum, dict, java.util.Arrays.copyOfRange(bytes, ds, de))
          }
          i = bodyEnd + 6
        } else i += 3
      }
    }
    out.result()
  }

  /** Inflate zlib/deflate data; None on corruption. */
  def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      var guard = 0
      while (!inf.finished() && guard < (1 << 16)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) guard = 1 << 16 // truncated
        else out.write(buf, 0, n)
        guard += 1
      }
      inf.end()
      if (out.size() == 0) None else Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** Decompressed (or raw) streams that look like text content streams,
    * in file order — each becomes one page.
    */
  def contentStreams(bytes: Array[Byte]): Vector[String] =
    objects(bytes).flatMap { rs =>
      val payload =
        if (rs.dict.contains("/FlateDecode")) inflate(rs.data)
        else Some(rs.data)
      payload.map(new String(_, "ISO-8859-1"))
        .filter(s => Extractor.sniff(s) == "pdf")
    }

  /** Content streams with CID/ToUnicode decoding applied (see
    * [[CidDecode]]): font-local glyph codes are remapped to Unicode
    * through each font's `/ToUnicode` CMap before parsing. Files
    * without `/ToUnicode` (all synthetic fixtures) take the plain
    * [[contentStreams]] path untouched.
    */
  private val ToUnicodeMarker = "/ToUnicode".getBytes("ISO-8859-1")
  private val ObjStmMarker = "/ObjStm".getBytes("ISO-8859-1")

  def decodedContentStreams(bytes: Array[Byte]): Vector[String] = {
    // byte-level guard: the common no-CMap path (every synthetic
    // fixture) must not pay a whole-file String copy. A /ToUnicode ref
    // may hide INSIDE a compressed /ObjStm, so ObjStm presence also
    // takes the resolving path.
    if (indexOf(bytes, ToUnicodeMarker, 0) < 0 &&
      indexOf(bytes, ObjStmMarker, 0) < 0) contentStreams(bytes)
    else {
      val raw = new String(bytes, "ISO-8859-1")
      val objs = objects(bytes)
      def payloadOf(rs: RawStream): Option[String] =
        (if (rs.dict.contains("/FlateDecode")) inflate(rs.data) else Some(rs.data))
          .map(new String(_, "ISO-8859-1"))
      val cmaps = objs.flatMap { rs =>
        payloadOf(rs)
          .filter(s => s.contains("beginbfchar") || s.contains("beginbfrange"))
          .map(s => rs.objNum -> CidDecode.parseCmap(s))
      }.toMap
      // PDF >= 1.5 packs page/font dicts into /ObjStm streams — expand
      // them so the object-graph resolution sees those dictionaries too
      val objStmBodies = objs.flatMap { rs =>
        if (rs.dict.contains("/ObjStm"))
          payloadOf(rs).toSeq.flatMap(p => CidDecode.parseObjStm(rs.dict, p))
        else Nil
      }.toMap
      val tables = CidDecode.fontTables(
        raw, objs.map(rs => rs.objNum -> rs.dict).toMap, cmaps, objStmBodies)
      objs.flatMap { rs =>
        payloadOf(rs).filter(s => Extractor.sniff(s) == "pdf").map { s =>
          tables.get(rs.objNum).map(f => CidDecode.rewrite(s, f)).getOrElse(s)
        }
      }
    }
  }

  /** An image XObject: undecoded payload + the intrinsic metadata its
    * stream dictionary declares — the reference's ImageBlock shape
    * (`app/models/parsing.py:20-29`: bytes + page + format), which also
    * carries image bytes opaquely to an external model. `page` is a
    * file-order heuristic: the number of text content streams seen before
    * the object (images typically follow their page's stream; a real
    * resolver would chase /Resources → /XObject references, which damaged
    * files often lack — this stays total on arbitrary bytes).
    */
  final case class ImageObj(
      objNum: Int, page: Int, width: Int, height: Int,
      format: String, data: Array[Byte])

  private val WidthRe = """/Width\s+(\d+)""".r
  private val HeightRe = """/Height\s+(\d+)""".r

  /** Scan for `/Subtype /Image` XObjects. DCT/JPX payloads pass through
    * verbatim (they ARE the jpeg/jp2 files); Flate payloads inflate to raw
    * samples; no pixel codec is required for any of this.
    */
  def images(bytes: Array[Byte]): Vector[ImageObj] = images(bytes, withData = true)

  /** `withData = false` skips payload work entirely (no inflate, no
    * copy; `data` comes back empty) — the column-pruned metadata
    * listing path of [[graft.sources.PdfDirectorySource]].
    */
  def images(bytes: Array[Byte], withData: Boolean): Vector[ImageObj] = {
    var streamsSeen = 0
    val out = Vector.newBuilder[ImageObj]
    objects(bytes).foreach { rs =>
      if (rs.dict.contains("/Subtype") && rs.dict.contains("/Image")) {
        val w = WidthRe.findFirstMatchIn(rs.dict).map(_.group(1).toInt).getOrElse(0)
        val h = HeightRe.findFirstMatchIn(rs.dict).map(_.group(1).toInt).getOrElse(0)
        // the EOL before `endstream` is not part of the stream data
        // (PDF 32000-1 §7.3.8); the text path keeps it (harmless there)
        val trimmed = {
          var e = rs.data.length
          if (e > 0 && rs.data(e - 1) == '\n') e -= 1
          if (e > 0 && rs.data(e - 1) == '\r') e -= 1
          if (e == rs.data.length) rs.data else java.util.Arrays.copyOf(rs.data, e)
        }
        val (fmt, data) =
          if (rs.dict.contains("/DCTDecode"))
            ("jpeg", if (withData) trimmed else Array.emptyByteArray)
          else if (rs.dict.contains("/JPXDecode"))
            ("jpeg2000", if (withData) trimmed else Array.emptyByteArray)
          else if (rs.dict.contains("/FlateDecode")) {
            // metadata-only reads report the dict-derived format and never
            // inflate; corruption ("corrupt") is only detectable — and only
            // matters — when the payload is actually fetched
            if (withData) inflate(trimmed).map(("raw", _)).getOrElse(("corrupt", trimmed))
            else ("raw", Array.emptyByteArray)
          } else ("raw", if (withData) trimmed else Array.emptyByteArray)
        out += ImageObj(rs.objNum, math.max(streamsSeen - 1, 0), w, h, fmt, data)
      } else {
        val payload =
          if (rs.dict.contains("/FlateDecode")) inflate(rs.data) else Some(rs.data)
        if (payload.map(new String(_, "ISO-8859-1"))
          .exists(s => Extractor.sniff(s) == "pdf")) streamsSeen += 1
      }
    }
    out.result()
  }

  /** Full file extraction with per-stream tolerance: a malformed content
    * stream (e.g. an operator with an empty operand stack) drops ONLY that
    * stream, not the document. Returns (pages, nStreams, nFailedStreams)
    * so the caller can distinguish "no text in the file" (blank) from
    * "every stream failed to parse" (parse_error).
    */
  def extractStats(bytes: Array[Byte]): (Vector[Pdf.PageText], Int, Int) = {
    val streams =
      try decodedContentStreams(bytes)
      catch { case scala.util.control.NonFatal(_) => Vector.empty[String] }
    var failed = 0
    val pages = streams.zipWithIndex.flatMap { case (s, pg) =>
      try Some(Pdf.pageFromStream(s, pg))
      catch { case scala.util.control.NonFatal(_) => failed += 1; None }
    }
    val out =
      try Pdf.suppressHeadersFooters(pages).zipWithIndex
        .map { case (ls, i) => Pdf.PageText(i, ls) }
      catch {
        case scala.util.control.NonFatal(_) => failed = streams.length; Vector.empty[Pdf.PageText]
      }
    (out, streams.length, failed)
  }

  /** Full file extraction: content streams → pages → header/footer
    * suppression across pages. Total on arbitrary bytes.
    */
  def extract(bytes: Array[Byte]): Vector[Pdf.PageText] = extractStats(bytes)._1

  /** Main text of a PDF file: pages in order, lines joined "\n". */
  def mainText(bytes: Array[Byte]): String =
    extract(bytes).flatMap(_.lines.map(_.text)).mkString("\n")

  /** Quick signature check for dispatching binary payloads. */
  def looksPdfFile(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'
}
