package graft.extract

import graft.text.PyText._

import java.util.Locale
import scala.collection.mutable

/** Hand-built HTML tag tokenizer + main-content (boilerplate) stripper.
  *
  * The reference (rafalpronko/pdf-parser) delegates HTML handling to
  * BeautifulSoup for table extraction only (`app/parsers/
  * rag_anything_parser.py:169-202`); the north rule requires a native
  * "tag tokenizer + text-density/link-density DOM heuristics a la
  * Boilerpipe". This file implements both:
  *
  *  - a single-pass, allocation-light tag tokenizer (no DOM tree) emitting
  *    (start-tag, end-tag, text) events with source offsets — raw-text
  *    elements (`script/style/...`), comments, doctypes and entity
  *    references handled;
  *  - block segmentation at block-level tag boundaries, accumulating
  *    per-block word and anchor-word counts;
  *  - the published Boilerpipe `NumWordsRulesClassifier` decision rules
  *    (Kohlschütter et al., WSDM 2010, "Boilerplate Detection using
  *    Shallow Text Features") over (link density, word count) of the
  *    previous/current/next block — public-paper heuristics, no code
  *    reuse;
  *  - structural overrides: `<article>/<main>` focus, container boilerplate
  *    (`nav/header/footer/aside/...`) always stripped;
  *  - `<table>` cell extraction with BeautifulSoup `get_text(strip=True)`
  *    semantics (descendant strings stripped and joined with "",
  *    `rag_anything_parser.py:188-195`), first row = header heuristic
  *    (`:286-291`).
  *
  * Pure JVM function — runs inside `mapPartitions` on executors with zero
  * external deps; deterministic for the golden-parity gate.
  */
object Html {

  // --- tokenizer ------------------------------------------------------------

  sealed trait Event
  final case class StartTag(name: String, attrs: Map[String, String],
      start: Int, end: Int, selfClosing: Boolean) extends Event
  final case class EndTag(name: String, start: Int, end: Int) extends Event
  /** Decoded text content; [start,end) are raw source offsets. */
  final case class Text(text: String, start: Int, end: Int) extends Event

  /** Elements whose content is raw text (no tag parsing until the matching
    * close tag), per the HTML5 tokenizer states.
    */
  private val RawText = Set("script", "style", "textarea", "title", "xmp")

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "rsquo" -> "’", "lsquo" -> "‘", "ldquo" -> "“",
    "rdquo" -> "”", "shy" -> "", "times" -> "×", "bull" -> "•")

  /** Decode character references; unknown ones pass through verbatim. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try { out.appendAll(Character.toChars(Integer.parseInt(body.substring(2), 16))); i = semi + 1 }
            catch { case _: Exception => out.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try { out.appendAll(Character.toChars(Integer.parseInt(body.substring(1)))); i = semi + 1 }
            catch { case _: Exception => out.append(c); i += 1 }
          } else NamedEntities.get(body.toLowerCase(Locale.ROOT)) match {
            case Some(rep) => out.append(rep); i = semi + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  @inline private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

  /** Single linear pass over `html`, invoking `f` per event. */
  def tokenize(html: String)(f: Event => Unit): Unit =
    tokenize(html, keepAttrs = true)(f)

  /** As `tokenize`, with attribute capture optional: `extract` never reads
    * attributes, and skipping the per-tag Map + entity decode of every
    * attribute value removes the tokenizer's dominant allocations. Values
    * are still scanned (quote-aware) to find the true tag end.
    */
  def tokenize(html: String, keepAttrs: Boolean)(f: Event => Unit): Unit = {
    val n = html.length
    var i = 0
    var rawUntilClose: String = null
    while (i < n) {
      if (rawUntilClose != null) {
        // inside <script>/<style>/...: scan for the matching close tag
        val close = "</" + rawUntilClose
        var j = html.indexOf(close, i)
        // tolerate arbitrary case on the close tag — regionMatches keeps
        // offsets in the ORIGINAL string (a locale-lowered copy can change
        // length, e.g. U+0130, and misalign every index after it)
        if (j < 0) {
          val cl = close.length
          var k = i
          while (j < 0 && k <= n - cl) {
            if (html.regionMatches(true, k, close, 0, cl)) j = k else k += 1
          }
        }
        // RCDATA elements (title/textarea) decode entities; script/style
        // and friends stay raw, per the HTML5 tokenizer states
        val rcdata = rawUntilClose == "title" || rawUntilClose == "textarea"
        def payload(a: Int, b: Int): String = {
          val s = html.substring(a, b)
          if (rcdata) decodeEntities(s) else s
        }
        if (j < 0) {
          f(Text(payload(i, n), i, n)); i = n; rawUntilClose = null
        } else {
          if (j > i) f(Text(payload(i, j), i, j))
          val gt = html.indexOf('>', j)
          val end = if (gt < 0) n else gt + 1
          f(EndTag(rawUntilClose, j, end))
          i = end
          rawUntilClose = null
        }
      } else {
        val lt = html.indexOf('<', i)
        if (lt < 0) { f(Text(decodeEntities(html.substring(i)), i, n)); i = n }
        else {
          if (lt > i) f(Text(decodeEntities(html.substring(i, lt)), i, lt))
          if (lt + 1 >= n) { i = n }
          else html.charAt(lt + 1) match {
            case '!' =>
              if (html.startsWith("<!--", lt)) {
                val close = html.indexOf("-->", lt + 4)
                i = if (close < 0) n else close + 3
              } else {
                val gt = html.indexOf('>', lt)
                i = if (gt < 0) n else gt + 1
              }
            case '?' =>
              val gt = html.indexOf('>', lt)
              i = if (gt < 0) n else gt + 1
            case '/' =>
              var j = lt + 2
              val s = j
              while (j < n && isNameChar(html.charAt(j))) j += 1
              val name = html.substring(s, j).toLowerCase(Locale.ROOT)
              val gt = html.indexOf('>', j)
              val end = if (gt < 0) n else gt + 1
              if (name.nonEmpty) f(EndTag(name, lt, end))
              i = end
            case c if isNameChar(c) =>
              var j = lt + 1
              while (j < n && isNameChar(html.charAt(j))) j += 1
              val name = html.substring(lt + 1, j).toLowerCase(Locale.ROOT)
              // attributes
              val attrs: mutable.Map[String, String] =
                if (keepAttrs) mutable.Map.empty else null
              var selfClosing = false
              var done = false
              while (!done && j < n) {
                while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                if (j < n && html.charAt(j) == '>') { j += 1; done = true }
                else if (j + 1 < n && html.charAt(j) == '/' && html.charAt(j + 1) == '>') {
                  selfClosing = true; j += 2; done = true
                } else if (j >= n) done = true
                else {
                  val as = j
                  while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                    html.charAt(j) != '=' && html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
                  val anameEmpty = j == as
                  val aname = if (keepAttrs) html.substring(as, j).toLowerCase(Locale.ROOT) else null
                  while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                  if (j < n && html.charAt(j) == '=') {
                    j += 1
                    while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
                    if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                      val q = html.charAt(j)
                      val vs = j + 1
                      val ve = html.indexOf(q, vs)
                      if (ve < 0) {
                        if (keepAttrs) attrs(aname) = decodeEntities(html.substring(vs))
                        j = n
                      } else {
                        if (keepAttrs) attrs(aname) = decodeEntities(html.substring(vs, ve))
                        j = ve + 1
                      }
                    } else {
                      val vs = j
                      while (j < n && !Character.isWhitespace(html.charAt(j)) && html.charAt(j) != '>') j += 1
                      if (keepAttrs) attrs(aname) = decodeEntities(html.substring(vs, j))
                    }
                  } else if (!anameEmpty) { if (keepAttrs) attrs(aname) = "" }
                  // skip any stray delimiter except '>' (handled at loop
                  // top). A lone '/' NOT followed by '>' must advance too:
                  // the '/>' check above never consumes it, and excluding
                  // it here left the scanner stuck forever on inputs like
                  // `<a /x>` (found by ExtractorFuzzSpec)
                  else if (j < n && html.charAt(j) != '>') j += 1
                }
              }
              f(StartTag(name, if (keepAttrs) attrs.toMap else Map.empty, lt, j, selfClosing))
              if (RawText.contains(name) && !selfClosing) rawUntilClose = name
              i = j
            case _ =>
              f(Text("<", lt, lt + 1)); i = lt + 1
          }
        }
      }
    }
  }

  // --- block model ----------------------------------------------------------

  /** One text block with shallow-text features and raw source span. */
  final case class Block(
      text: String,
      kind: String, // "text" | "heading" | "table" | "list" (S4 layout kinds)
      words: Int,
      linkWords: Int,
      start: Int,
      end: Int,
      inArticle: Boolean) {
    def linkDensity: Double = if (words == 0) 0.0 else linkWords.toDouble / words
  }

  final case class Result(
      blocks: Vector[Block],
      content: Vector[Block],
      tables: Vector[Vector[Vector[String]]],
      title: String)

  /** Tags that end/begin a text block (block-level content model). */
  private val BlockTags = Set(
    "p", "div", "article", "section", "main", "aside", "nav", "header",
    "footer", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2", "h3", "h4",
    "h5", "h6", "table", "tr", "td", "th", "thead", "tbody", "blockquote",
    "pre", "br", "hr", "body", "html", "head", "title", "figure",
    "figcaption", "form", "fieldset", "address", "center")

  /** Containers whose entire subtree is boilerplate by structure. */
  private val BoilerplateContainers = Set(
    "nav", "header", "footer", "aside", "script", "style", "noscript",
    "head", "form", "button", "select", "option", "iframe", "svg", "menu")

  private val HeadingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** Tokenize + segment + classify. Main entry point. */
  def extract(html: String): Result = {
    val blocks = Vector.newBuilder[Block]
    val tables = Vector.newBuilder[Vector[Vector[String]]]
    var title = ""

    // segmentation state
    val sb = new StringBuilder
    var blkWords = 0
    var blkLinkWords = 0
    var blkStart = -1
    var blkEnd = -1
    var blkHeading = 0 // depth inside h1..h6
    var listDepth = 0 // depth inside li (S4 "list" kind, Adobe /L analog)
    var anchorDepth = 0
    var boilerDepth = 0
    var articleDepth = 0
    var inTitle = false

    // table state
    var tableDepth = 0
    var curTable: mutable.ArrayBuffer[Vector[String]] = null
    var curRow: mutable.ArrayBuffer[String] = null
    var curCell: StringBuilder = null
    var cellDepth = 0
    var cellBoilerBase = 0 // boilerDepth when the cell opened: text from
    // boilerplate subtrees NESTED IN the cell (script/style/nav inside a
    // td) must not leak into the cell text (found by semantic fuzz)
    var tableStart = -1
    var sawCellText = false

    def flush(): Unit = {
      val t = pyStrip(collapseWs(sb.toString))
      if (t.nonEmpty && boilerDepth == 0) {
        val kind =
          if (blkHeading > 0) "heading"
          else if (listDepth > 0) "list"
          else "text"
        blocks += Block(t, kind,
          blkWords, blkLinkWords, blkStart, blkEnd, articleDepth > 0)
      }
      sb.clear(); blkWords = 0; blkLinkWords = 0; blkStart = -1; blkEnd = -1
    }

    tokenize(html, keepAttrs = false) {
      case StartTag(name, _, s, e, selfClosing) =>
        if (BlockTags.contains(name)) flush()
        if (name == "title") inTitle = true
        if (BoilerplateContainers.contains(name) && !selfClosing) boilerDepth += 1
        if ((name == "article" || name == "main") && !selfClosing) articleDepth += 1
        if (name == "a" && !selfClosing) anchorDepth += 1
        if (name == "li" && !selfClosing) listDepth += 1
        if (HeadingTags.contains(name) && !selfClosing) blkHeading += 1
        if (name == "table") {
          tableDepth += 1
          if (tableDepth == 1) {
            curTable = mutable.ArrayBuffer.empty; tableStart = s
          }
        }
        if (tableDepth > 0) name match {
          case "tr" => curRow = mutable.ArrayBuffer.empty
          case "td" | "th" =>
            if (curRow == null) curRow = mutable.ArrayBuffer.empty
            curCell = new StringBuilder; cellDepth = 1; sawCellText = false
            cellBoilerBase = boilerDepth
          case _ => if (curCell != null) cellDepth += 1
        }

      case EndTag(name, s, e) =>
        if (BlockTags.contains(name)) flush()
        if (name == "title") inTitle = false
        if (BoilerplateContainers.contains(name) && boilerDepth > 0) boilerDepth -= 1
        if ((name == "article" || name == "main") && articleDepth > 0) articleDepth -= 1
        if (name == "a" && anchorDepth > 0) anchorDepth -= 1
        if (name == "li" && listDepth > 0) listDepth -= 1
        if (HeadingTags.contains(name) && blkHeading > 0) blkHeading -= 1
        if (tableDepth > 0) name match {
          case "td" | "th" =>
            if (curCell != null) { curRow += curCell.toString; curCell = null; cellDepth = 0 }
          case "tr" =>
            if (curRow != null && curRow.nonEmpty) { curTable += curRow.toVector }
            curRow = null
          case "table" =>
            tableDepth -= 1
            if (tableDepth == 0 && curTable != null) {
              if (curRow != null && curRow.nonEmpty) { curTable += curRow.toVector; curRow = null }
              if (curTable.nonEmpty) {
                tables += curTable.toVector
                // table rendered into the block stream too (deterministic
                // textual form: cells " | ", rows newline)
                val rendered = curTable.map(_.mkString(" | ")).mkString("\n")
                if (rendered.nonEmpty && boilerDepth == 0)
                  blocks += Block(rendered, "table",
                    pyWordCount(rendered), 0, tableStart, e, articleDepth > 0)
              }
              curTable = null
            }
          case _ => if (curCell != null && cellDepth > 0) cellDepth -= 1
        }

      case Text(t, s, e) =>
        if (inTitle) title += t
        if (curCell != null) {
          // get_text(strip=True) semantics: strip each string, join with "";
          // skip boilerplate subtrees opened INSIDE the cell
          val st = if (boilerDepth > cellBoilerBase) "" else pyStrip(t)
          if (st.nonEmpty) { curCell.append(st); sawCellText = true }
        } else if (tableDepth == 0 && boilerDepth == 0 && !pyIsBlank(t)) {
          // the boilerDepth check must run at APPEND time, not only at
          // flush: INLINE boilerplate (script/style/button — not block
          // tags, so they trigger no flush) would otherwise merge its raw
          // text into the surrounding block's buffer and survive the
          // flush-time check (found by semantic fuzz)
          if (blkStart < 0) blkStart = s
          blkEnd = e
          sb.append(t)
          val ws = pyWordCount(t)
          blkWords += ws
          if (anchorDepth > 0) blkLinkWords += ws
        }
    }
    flush()

    val all = blocks.result()
    Result(all, classify(all), tables.result(), pyStrip(collapseWs(title)))
  }

  /** Collapse whitespace runs to single spaces (HTML rendering rule). */
  def collapseWs(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    var lastWs = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (pyIsSpace(c)) { if (!lastWs && out.nonEmpty) out.append(' '); lastWs = true }
      else { out.append(c); lastWs = false }
      i += 1
    }
    out.toString
  }

  /** Boilerpipe NumWordsRulesClassifier (public decision rules from the
    * WSDM'10 paper's released decision tree), with two structural
    * overrides: article/main focus and heading adjacency.
    */
  def classify(all: Vector[Block]): Vector[Block] = {
    if (all.isEmpty) return all
    val hasArticle = all.exists(_.inArticle)
    val candidates = if (hasArticle) all.filter(_.inArticle) else all

    def words(i: Int): Int =
      if (i < 0 || i >= candidates.length) 0 else candidates(i).words
    def ld(i: Int): Double =
      if (i < 0 || i >= candidates.length) 0.0 else candidates(i).linkDensity

    val isContent = Array.tabulate(candidates.length) { i =>
      val c = candidates(i)
      if (c.kind == "table") c.words > 0 && ld(i) <= 0.333333
      else if (ld(i) > 0.333333) false
      else if (ld(i - 1) <= 0.555556)
        words(i) > 16 || words(i + 1) > 15 || words(i - 1) > 4
      else
        words(i) > 40 || words(i + 1) > 17
    }
    // headings adjacent to content survive (section titles are short but
    // are main content when they head a kept block)
    val keep = Array.tabulate(candidates.length) { i =>
      isContent(i) ||
        (candidates(i).kind == "heading" && ld(i) <= 0.333333 &&
          (i + 1 < candidates.length) && isContent(i + 1))
    }
    candidates.zipWithIndex.collect { case (b, i) if keep(i) => b }
  }

  /** Main text: kept blocks joined by "\n". */
  def mainText(html: String): String =
    extract(html).content.map(_.text).mkString("\n")
}
