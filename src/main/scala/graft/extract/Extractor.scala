package graft.extract

import graft.text.PyText._

/** Per-turn main-content extraction: sniff the payload kind of a
  * transcript turn's `text` column and dispatch to the matching native
  * extractor. This is the unit the pipeline maps over every turn
  * (north rule: HTML boilerplate strip | PDF content-stream parse |
  * passthrough, with span offsets into the source text).
  *
  * The reference's analog is the parser dispatch in
  * rafalpronko/pdf-parser `app/services/document_service.py:157-163`
  * (backend selection) + format validation
  * (`app/storage/file_storage.py:35-74`); ours sniffs content, not file
  * suffixes, because transcript turns carry the payload inline.
  */
object Extractor {

  final case class Span(start: Int, end: Int, label: String)

  /** Result of extracting one turn. `skipReason` is "" on success;
    * non-empty means the turn produced no content ("empty", "blank",
    * "parse_error"). `blockLens` holds the length of each block's text
    * inside `text` (blocks are joined with "\n"), parallel to `spans` —
    * block texts may themselves contain newlines (rendered tables), so
    * lengths, not separators, are the reliable block boundaries. Used by
    * structure-aware chunking to rebuild the block stream without
    * re-extracting.
    */
  final case class Extraction(
      kind: String, // plain | html | pdf
      text: String,
      spans: Vector[Span],
      bytesParsed: Long,
      skipReason: String,
      blockLens: Vector[Int] = Vector.empty)

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Index just past the next standalone occurrence of `tok` (word
    * boundaries both sides) at or after `from`; -1 if none.
    */
  private def tokenAfter(text: String, tok: String, from: Int): Int = {
    var i = from
    val n = text.length
    val m = tok.length
    while (i >= 0 && i + m <= n) {
      i = text.indexOf(tok, i)
      if (i < 0) return -1
      val okL = i == 0 || !isWordChar(text.charAt(i - 1))
      val okR = i + m == n || !isWordChar(text.charAt(i + m))
      if (okL && okR) return i + m
      i += 1
    }
    -1
  }

  /** PDF content stream: a standalone `BT` … show-text op (`Tj`/`TJ`) …
    * `ET` sequence (hand-rolled — the equivalent `(?s)\bBT\b.*\b(Tj|TJ)
    * \b.*\bET\b` regex costs ~20µs/turn, which dominates plain turns).
    */
  private def looksPdf(text: String): Boolean = {
    val afterBt = tokenAfter(text, "BT", 0)
    if (afterBt < 0) return false
    val tj = tokenAfter(text, "Tj", afterBt)
    val tJ = tokenAfter(text, "TJ", afterBt)
    val afterShow = if (tj < 0) tJ else if (tJ < 0) tj else math.min(tj, tJ)
    if (afterShow < 0) return false
    tokenAfter(text, "ET", afterShow) > 0
  }

  private val HtmlTagNames = Set(
    "html", "head", "body", "div", "p", "br", "table", "article",
    "section", "main", "nav", "header", "footer", "span",
    "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li")

  /** Structural HTML tag anywhere in the payload. Mirrors the regex
    * `(?is)<\s*(!doctype|html|...|h[1-6]|ul|ol|li|a\s)` semantics.
    */
  private def looksHtml(text: String): Boolean = {
    var i = text.indexOf('<')
    val n = text.length
    while (i >= 0) {
      var j = i + 1
      while (j < n && Character.isWhitespace(text.charAt(j))) j += 1
      if (j < n) {
        if (text.charAt(j) == '!' && text.regionMatches(true, j + 1, "doctype", 0, 7))
          return true
        val s = j
        while (j < n && j - s < 8 &&
          (Character.isLetterOrDigit(text.charAt(j)))) j += 1
        val name = text.substring(s, j).toLowerCase
        // `a` only counts when followed by whitespace (attribute follows),
        // like the reference regex's `a\s`
        if (name == "a") {
          if (j < n && Character.isWhitespace(text.charAt(j))) return true
        } else if (HtmlTagNames.contains(name) &&
          (j >= n || !isWordChar(text.charAt(j)))) return true
      }
      i = text.indexOf('<', i + 1)
    }
    false
  }

  /** PDF span label: `pdf_line_p3` for body text, `pdf_line_p3:heading`
    * (etc.) when the S4 layout classifier assigns a non-default kind —
    * the page digits stay parseable by prefix+takeWhile(isDigit).
    */
  private def pdfLabel(prefix: String, page: Int, kind: String): String =
    if (kind == "text") s"$prefix$page" else s"$prefix$page:$kind"

  /** Classify a turn payload: "pdf_file" | "pdf" | "html" | "plain". */
  def sniff(text: String): String = {
    if (text == null || text.isEmpty) "plain"
    else if (text.startsWith("%PDF-")) "pdf_file"
    else if (looksPdf(text)) "pdf"
    else if (looksHtml(text)) "html"
    else "plain"
  }

  /** Size cap on a single turn's payload, matching the reference's
    * upload validation default (`app/config.py:83-86`,
    * `max_file_size = 50 * 1024 * 1024`;
    * `file_storage.py:76-92` `validate_file_size`). At 10^12 turns an
    * unguarded mega-payload in one row is an executor-OOM task killer —
    * the extractors buffer the whole payload — so the guard is a scale
    * requirement here, not just API parity.
    */
  val DefaultMaxPayloadChars: Int = 50 * 1024 * 1024

  /** Extract one turn. Deterministic, pure; total — a malformed payload
    * that breaks its parser mid-stream (e.g. a content-stream operator
    * with no operands) degrades to `skipReason = "parse_error"` instead
    * of throwing. At 10^12 turns a single throwing turn would kill its
    * executor task and, after retries, the whole job — the reference's
    * analog is the per-document FAILED state + cleanup
    * (`document_service.py:332-355`). Payloads over `maxChars` are
    * skipped as "too_large" without parsing (the reference's
    * FileValidationError path, `file_storage.py:76-92`).
    */
  def extract(text: String,
      maxChars: Int = DefaultMaxPayloadChars): Extraction = {
    if (text == null || text.isEmpty)
      return Extraction("plain", "", Vector.empty, 0L, "empty")
    if (text.length > maxChars)
      return Extraction("plain", "", Vector.empty, text.length.toLong, "too_large")
    sniff(text) match {
      case "pdf_file" =>
        // a whole PDF FILE riding in the text column (ISO-8859-1-mangled
        // binary). Spans index the DECOMPRESSED content streams — source
        // offsets are undefined through compression, so the label carries
        // the page instead.
        try {
          val bytes = text.getBytes("ISO-8859-1")
          val (pages, nStreams, nFailed) = PdfFile.extractStats(bytes)
          val lines = pages.flatMap(_.lines)
          val out = lines.map(_.text).mkString("\n")
          if (pyStrip(out).isEmpty) {
            // every content stream failed to parse → the document is
            // damaged, not empty; only report blank when streams parsed
            // but carried no text
            val reason = if (nStreams > 0 && nFailed == nStreams) "parse_error" else "blank"
            Extraction("pdf_file", "", Vector.empty, text.length.toLong, reason)
          } else {
            val kinds = Pdf.lineKinds(lines)
            Extraction("pdf_file", out,
              lines.zip(kinds).map { case (l, k) =>
                Span(l.start, l.end, pdfLabel("pdf_file_p", l.page, k))
              },
              text.length.toLong, "", lines.map(_.text.length))
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Extraction("pdf_file", "", Vector.empty, text.length.toLong, "parse_error")
        }
      case "pdf" =>
        try {
          val pages = Pdf.extract(text)
          val lines = pages.flatMap(_.lines)
          val out = lines.map(_.text).mkString("\n")
          if (pyStrip(out).isEmpty)
            Extraction("pdf", "", Vector.empty, text.length.toLong, "blank")
          else {
            val kinds = Pdf.lineKinds(lines)
            Extraction("pdf", out,
              lines.zip(kinds).map { case (l, k) =>
                Span(l.start, l.end, pdfLabel("pdf_line_p", l.page, k))
              },
              text.length.toLong, "", lines.map(_.text.length))
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Extraction("pdf", "", Vector.empty, text.length.toLong, "parse_error")
        }
      case "html" =>
        try {
          val res = Html.extract(text)
          val out = res.content.map(_.text).mkString("\n")
          if (pyStrip(out).isEmpty)
            Extraction("html", "", Vector.empty, text.length.toLong, "blank")
          else
            Extraction("html", out,
              res.content.map(b => Span(b.start, b.end, b.kind)),
              text.length.toLong, "", res.content.map(_.text.length))
        } catch {
          case scala.util.control.NonFatal(_) =>
            Extraction("html", "", Vector.empty, text.length.toLong, "parse_error")
        }
      case _ =>
        val out = text
        if (pyStrip(out).isEmpty)
          Extraction("plain", "", Vector.empty, text.length.toLong, "blank")
        else
          Extraction("plain", out, Vector(Span(0, text.length, "text")),
            text.length.toLong, "", Vector(out.length))
    }
  }
}
