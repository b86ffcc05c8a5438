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
    * non-empty means the turn produced no content ("empty", "blank").
    */
  final case class Extraction(
      kind: String, // plain | html | pdf
      text: String,
      spans: Vector[Span],
      bytesParsed: Long,
      skipReason: String)

  // PDF content streams: a text object with at least one show-text op.
  private val PdfSniff =
    java.util.regex.Pattern.compile("(?s)\\bBT\\b.*\\b(Tj|TJ)\\b.*\\bET\\b")
  // HTML: a structural tag early in the payload.
  private val HtmlSniff = java.util.regex.Pattern.compile(
    "(?is)<\\s*(!doctype|html|head|body|div|p\\b|br\\b|table|article|section|main|nav|header|footer|span|h[1-6]|ul|ol|li|a\\s)")

  /** Classify a turn payload: "pdf" | "html" | "plain". */
  def sniff(text: String): String = {
    if (text == null || text.isEmpty) "plain"
    else if (PdfSniff.matcher(text).find()) "pdf"
    else if (HtmlSniff.matcher(text).find()) "html"
    else "plain"
  }

  /** Extract one turn. Deterministic, pure; total (never throws on
    * arbitrary input — malformed payloads degrade to best-effort text).
    */
  def extract(text: String): Extraction = {
    if (text == null || text.isEmpty)
      return Extraction("plain", "", Vector.empty, 0L, "empty")
    sniff(text) match {
      case "pdf" =>
        val pages = Pdf.extract(text)
        val lines = pages.flatMap(_.lines)
        val out = lines.map(_.text).mkString("\n")
        if (pyStrip(out).isEmpty)
          Extraction("pdf", "", Vector.empty, text.length.toLong, "blank")
        else
          Extraction("pdf", out,
            lines.map(l => Span(l.start, l.end, s"pdf_line_p${l.page}")),
            text.length.toLong, "")
      case "html" =>
        val res = Html.extract(text)
        val out = res.content.map(_.text).mkString("\n")
        if (pyStrip(out).isEmpty)
          Extraction("html", "", Vector.empty, text.length.toLong, "blank")
        else
          Extraction("html", out,
            res.content.map(b => Span(b.start, b.end, b.kind)),
            text.length.toLong, "")
      case _ =>
        val out = text
        if (pyStrip(out).isEmpty)
          Extraction("plain", "", Vector.empty, text.length.toLong, "blank")
        else
          Extraction("plain", out, Vector(Span(0, text.length, "text")),
            text.length.toLong, "")
    }
  }
}
