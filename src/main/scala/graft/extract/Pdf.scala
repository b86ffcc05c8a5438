package graft.extract

import scala.collection.mutable

/** Hand-built PDF text/layout extractor over raw content streams.
  *
  * The reference (rafalpronko/pdf-parser) delegates PDF parsing to external
  * engines (MinerU/Adobe/GPT-4o — `app/parsers/` modules); the north rule
  * requires a native "content-stream token parse, x-y cut reading-order
  * reconstruction, header/footer suppression". Implemented from the public
  * PDF 1.7 spec (ISO 32000-1 §9.4 text objects / §7.3 lexical conventions)
  * and the classic recursive X-Y cut algorithm (Nagy & Seth, 1984):
  *
  *  - lexer: numbers, literal strings `(...)` with escapes, hex strings
  *    `<...>`, arrays, names, operators; comments `%` to EOL; multi-page
  *    streams delimited by `%%Page: N` comment lines;
  *  - text state machine: `BT/ET`, `Td/TD/Tm/T*`, `TL`, `Tf`, `Tj/TJ/'/"`
  *    — tracks the line-matrix origin (x, y) and font size; glyph widths
  *    are approximated at 0.5 em (no font metrics in a bare stream);
  *  - TJ kerning: adjustments ≤ -180/1000 em render as a space (standard
  *    word-spacing heuristic used by every open-source text extractor);
  *  - lines: items grouped by baseline y (±2pt), ordered by x, joined with
  *    a space on gaps > 0.25 em;
  *  - reading order: recursive X-Y cut over line bboxes — split on the
  *    widest horizontal whitespace valley, then vertical (handles
  *    multi-column layouts), recursing until atomic;
  *  - header/footer suppression: on multi-page docs, lines in the top /
  *    bottom 12% of the page whose digit-normalized text recurs on ≥ half
  *    (and ≥ 2) of the pages are dropped.
  *
  * Pure JVM, deterministic; spans are [start,end) offsets into the source
  * stream covering each emitted line's string tokens.
  */
object Pdf {

  /** One positioned string draw. */
  final case class TextItem(x: Double, y: Double, fontSize: Double,
      text: String, start: Int, end: Int)

  /** One reconstructed line on a page. */
  final case class Line(page: Int, x0: Double, x1: Double, y: Double,
      fontSize: Double, text: String, start: Int, end: Int)

  // --- lexer ----------------------------------------------------------------
  //
  // Token representation: a TAGGED PARALLEL-ARRAY operand stack instead of
  // a sealed-trait ADT. Extraction runs inside executor mapPartitions over
  // millions of turns; one case-class allocation per token (6 numbers per
  // `Tm` alone) made GC the scaling bottleneck across co-located executor
  // JVMs. Tags: 0 = number, 1 = string, 2 = name, 3 = dict-open, 4 =
  // pre-assembled TJ array.

  /** Allocation-free parse of a PDF numeric operand (sign, digits, one
    * dot — the full grammar, PDF has no exponents). NaN on malformed.
    * Numbers dominate content streams (6 per `Tm`), so this avoids a
    * substring + toDouble per operand.
    */
  private def parseNum(s: String, from: Int, until: Int): Double = {
    var i = from
    if (i >= until) return Double.NaN
    var neg = false
    s.charAt(i) match {
      case '-' => neg = true; i += 1
      case '+' => i += 1
      case _ =>
    }
    var intPart = 0L
    var frac = 0L
    var fracDigits = 0
    var sawDigit = false
    var sawDot = false
    while (i < until) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        sawDigit = true
        if (sawDot) { frac = frac * 10 + (c - '0'); fracDigits += 1 }
        else intPart = intPart * 10 + (c - '0')
      } else if (c == '.' && !sawDot) sawDot = true
      else return Double.NaN // second dot or stray sign
      i += 1
    }
    if (!sawDigit) return Double.NaN
    var v = intPart.toDouble
    if (fracDigits > 0) v += frac / math.pow(10, fracDigits)
    if (neg) -v else v
  }

  @inline private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0

  /** Decode a literal string `(...)` starting at `i0` (at the '(') into
    * `out` (cleared first). Returns the end index. Bounded by `until` so
    * the lexer runs in place over the full source (no per-page substring).
    */
  private def literalStringInto(out: java.lang.StringBuilder, s: String,
      i0: Int, until: Int): Int = {
    out.setLength(0)
    var i = i0 + 1
    var depth = 1
    while (i < until && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < until) {
        s.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case d if d >= '0' && d <= '7' =>
            var j = i + 1
            var v = 0
            while (j < until && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1
            }
            out.append(v.toChar); i = j
          case other => out.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) out.append(c); i += 1 }
      else { out.append(c); i += 1 }
    }
    i
  }

  @inline private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode a hex string `<...>` starting at `i0` into `out` (cleared
    * first). Returns the end index. Invalid digit pairs are dropped, as
    * the previous `Integer.parseInt`-based decoder did via its catch.
    */
  private def hexStringInto(out: java.lang.StringBuilder, s: String,
      i0: Int, until: Int): Int = {
    out.setLength(0)
    var i = i0 + 1
    var have = 0 // pending nibble count
    var pend = 0
    var pendOk = true
    while (i < until && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!isWs(c)) {
        val v = hexVal(c)
        if (have == 0) { pend = v; pendOk = v >= 0; have = 1 }
        else {
          if (pendOk && v >= 0) out.append(((pend << 4) | v).toChar)
          have = 0
        }
      }
      i += 1
    }
    if (have == 1 && pendOk) out.append((pend << 4).toChar) // odd → pad '0'
    if (i < until) i + 1 else i
  }

  /** Run the text-object state machine over `src[from, until)` in place.
    * Span offsets are absolute indices into `src`.
    */
  private def runPage(src: String, from: Int, until: Int): Vector[TextItem] = {
    val items = Vector.newBuilder[TextItem]

    // tagged parallel-array operand stack (see lexer note above)
    var cap = 16
    var tags = new Array[Byte](cap)
    var nums = new Array[Double](cap)
    var strs = new Array[String](cap)
    var sts = new Array[Int](cap)
    var ens = new Array[Int](cap)
    var sp = 0
    @inline def grown(): Unit = if (sp == cap) {
      cap *= 2
      tags = java.util.Arrays.copyOf(tags, cap)
      nums = java.util.Arrays.copyOf(nums, cap)
      strs = java.util.Arrays.copyOf(strs, cap)
      sts = java.util.Arrays.copyOf(sts, cap)
      ens = java.util.Arrays.copyOf(ens, cap)
    }
    @inline def pushNum(v: Double): Unit = { grown(); tags(sp) = 0; nums(sp) = v; sp += 1 }
    @inline def pushStr(v: String, s0: Int, e0: Int): Unit = {
      grown(); tags(sp) = 1; strs(sp) = v; sts(sp) = s0; ens(sp) = e0; sp += 1
    }
    @inline def pushTag(t: Byte): Unit = { grown(); tags(sp) = t; sp += 1 }
    // numeric view of a stack slot, 0.0 for non-numbers (as `num` did on
    // the ADT stack)
    @inline def numAt(idx: Int): Double = if (tags(idx) == 0) nums(idx) else 0.0
    /** Pop up to k entries; returns how many were popped. The popped
      * entries remain readable at indices [sp, sp+returned) in stack
      * order, matching the old popN's Vector order.
      */
    @inline def popUpTo(k: Int): Int = {
      val take = if (k < sp) k else sp
      sp -= take
      take
    }

    val strSb = new java.lang.StringBuilder(64)
    val tjSb = new java.lang.StringBuilder(64)

    var inText = false
    var fontSize = 12.0
    var leading = 14.4
    var lineX = 0.0
    var lineY = 0.0
    var curX = 0.0
    var curY = 0.0

    @inline def widthOf(text: String): Double = text.length * 0.5 * fontSize

    def emit(str: String, s0: Int, e0: Int): Unit = {
      if (str.nonEmpty) items += TextItem(curX, curY, fontSize, str, s0, e0)
      curX += widthOf(str)
    }

    @inline def popTjLike(): Unit = { // shared by Tj and '
      val take = popUpTo(1)
      if (take == 1 && tags(sp) == 1 && inText) emit(strs(sp), sts(sp), ens(sp))
    }

    // 2-char operator dispatch; `sp = 0` = the old `stack.clear()` on
    // unknown operators. Tf/TL on an empty stack threw (`.last`/`.head` of
    // empty Vector) in the ADT version and the thrown path is part of the
    // golden-locked behavior — kept.
    def doOp2(c0: Char, c1: Char): Unit = (c0: @inline) match {
      case 'B' => if (c1 == 'T') { inText = true; lineX = 0; lineY = 0; curX = 0; curY = 0 } else sp = 0
      case 'E' => if (c1 == 'T') inText = false else sp = 0
      case 'T' => c1 match {
        case 'f' =>
          val n0 = sp
          popUpTo(2)
          if (n0 == 0) throw new NoSuchElementException("Tf on empty operand stack")
          fontSize = numAt(n0 - 1)
          leading = if (leading == 0) fontSize * 1.2 else leading
        case 'L' =>
          if (sp == 0) throw new NoSuchElementException("TL on empty operand stack")
          popUpTo(1); leading = numAt(sp)
        case 'd' =>
          if (popUpTo(2) == 2) { lineX += numAt(sp); lineY += numAt(sp + 1) }
          curX = lineX; curY = lineY
        case 'D' =>
          if (popUpTo(2) == 2) {
            leading = -numAt(sp + 1); lineX += numAt(sp); lineY += numAt(sp + 1)
          }
          curX = lineX; curY = lineY
        case 'm' =>
          if (popUpTo(6) == 6) { lineX = numAt(sp + 4); lineY = numAt(sp + 5) }
          curX = lineX; curY = lineY
        case '*' => lineY -= leading; curX = lineX; curY = lineY
        case 'j' => popTjLike()
        case 'J' =>
          val take = popUpTo(1)
          if (take == 1 && tags(sp) == 4 && inText) {
            val s = strs(sp)
            if (s.nonEmpty && sts(sp) >= 0) {
              items += TextItem(curX, curY, fontSize, s, sts(sp), ens(sp))
              curX += widthOf(s)
            }
          }
        case _ => sp = 0
      }
      case _ => sp = 0
    }

    var i = from
    while (i < until) {
      val c = src.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '%') {
        val nl = src.indexOf('\n', i)
        i = if (nl < 0 || nl >= until) until else nl + 1
      } else if (c == '(') {
        val st = i
        val e = literalStringInto(strSb, src, i, until)
        pushStr(strSb.toString, st, e); i = e
      } else if (c == '<' && i + 1 < until && src.charAt(i + 1) != '<') {
        val st = i
        val e = hexStringInto(strSb, src, i, until)
        pushStr(strSb.toString, st, e); i = e
      } else if (c == '<') { i += 2; pushTag(3) }
      else if (c == '>') { i += (if (i + 1 < until && src.charAt(i + 1) == '>') 2 else 1) }
      else if (c == '[') {
        // lex the array body in place, assembling the TJ string directly
        // (string concat + space for kerning adjustments ≤ -180/1000 em);
        // the assembly has no dependence on exec-time text state, so
        // lex-time assembly is observationally identical to the old
        // TArr-then-TJ two-step
        var depth = 1
        var j = i + 1
        while (j < until && depth > 0) {
          val cc = src.charAt(j)
          if (cc == '(') j = literalStringInto(strSb, src, j, until)
          else { if (cc == '[') depth += 1 else if (cc == ']') depth -= 1; j += 1 }
        }
        val m = math.max(i + 1, j - 1)
        tjSb.setLength(0)
        var s0 = -1
        var e0 = -1
        var k = i + 1
        while (k < m) {
          val ic = src.charAt(k)
          if (isWs(ic)) k += 1
          else if (ic == '(') {
            val st = k
            val e = literalStringInto(strSb, src, k, m)
            if (s0 < 0) s0 = st
            e0 = e; tjSb.append(strSb); k = e
          } else if (ic == '<') {
            val st = k
            val e = hexStringInto(strSb, src, k, m)
            if (s0 < 0) s0 = st
            e0 = e; tjSb.append(strSb); k = e
          } else {
            val st = k
            while (k < m && !isWs(src.charAt(k)) && src.charAt(k) != '(' && src.charAt(k) != '<') k += 1
            val v = parseNum(src, st, k)
            if (!v.isNaN && v <= -180) tjSb.append(' ')
          }
        }
        grown(); tags(sp) = 4; strs(sp) = tjSb.toString; sts(sp) = s0; ens(sp) = e0; sp += 1
        i = j
      } else if (c == '/') {
        var j = i + 1
        while (j < until && !isWs(src.charAt(j)) && !isDelim(src.charAt(j))) j += 1
        pushTag(2); i = j // name content is never consumed — no substring
      } else if ((c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.') {
        var j = i
        while (j < until && ((src.charAt(j) >= '0' && src.charAt(j) <= '9') ||
          src.charAt(j) == '-' || src.charAt(j) == '+' || src.charAt(j) == '.')) j += 1
        val v = parseNum(src, i, j)
        if (!v.isNaN) pushNum(v)
        i = j
      } else {
        var j = i
        while (j < until && !isWs(src.charAt(j)) && !isDelim(src.charAt(j))) j += 1
        val len = j - i
        if (len == 1) {
          if (c == '\'') { lineY -= leading; curX = lineX; curY = lineY; popTjLike() }
          else if (c == '"') {
            val take = popUpTo(3)
            lineY -= leading; curX = lineX; curY = lineY
            if (take >= 1) {
              val top = sp + take - 1
              if (tags(top) == 1 && inText) emit(strs(top), sts(top), ens(top))
            }
          } else sp = 0
        } else if (len == 2) doOp2(c, src.charAt(i + 1))
        else if (len > 2) sp = 0
        i = math.max(j, i + 1)
      }
    }
    items.result()
  }

  // --- line reconstruction --------------------------------------------------

  private def toLines(items: Vector[TextItem], page: Int): Vector[Line] = {
    if (items.isEmpty) return Vector.empty
    val sorted = items.sortBy(it => (-it.y, it.x, it.start))
    val lines = Vector.newBuilder[Line]
    var group = mutable.ArrayBuffer(sorted.head)
    def flush(): Unit = {
      // same baseline; split into fragments on column-sized x-gaps
      // (> 2 em) so multi-column rows stay separate lines for the X-Y cut
      val g = group.sortBy(it => (it.x, it.start))
      var frag = mutable.ArrayBuffer.empty[TextItem]
      var prevEndX = Double.NaN

      def emitFrag(): Unit = if (frag.nonEmpty) {
        val sb = new StringBuilder
        var endX = Double.NaN
        var fs = 0.0
        frag.foreach { it =>
          if (sb.nonEmpty) {
            val gap = it.x - endX
            if (gap > 0.25 * it.fontSize && !sb.last.isWhitespace &&
              !it.text.headOption.exists(_.isWhitespace)) sb.append(' ')
          }
          sb.append(it.text)
          endX = it.x + it.text.length * 0.5 * it.fontSize
          fs = math.max(fs, it.fontSize)
        }
        lines += Line(page, frag.head.x, endX, frag.head.y, fs,
          sb.toString, frag.map(_.start).min, frag.map(_.end).max)
        frag = mutable.ArrayBuffer.empty
      }

      g.foreach { it =>
        if (frag.nonEmpty && it.x - prevEndX > 2.0 * it.fontSize) emitFrag()
        frag += it
        prevEndX = it.x + it.text.length * 0.5 * it.fontSize
      }
      emitFrag()
      group = mutable.ArrayBuffer.empty
    }
    sorted.tail.foreach { it =>
      if (math.abs(it.y - group.head.y) <= 2.0) group += it
      else { flush(); group += it }
    }
    flush()
    lines.result()
  }

  // --- recursive X-Y cut ----------------------------------------------------

  /** Reading order via recursive X-Y cut: prefer the widest horizontal
    * valley (row split, top first), else the widest vertical valley
    * (column split, left first), else y-then-x order.
    */
  def xyCut(lines: Vector[Line]): Vector[Line] = {
    if (lines.length <= 1) return lines
    val medianFs = {
      val fs = lines.map(_.fontSize).sorted
      fs(fs.length / 2)
    }
    val hThresh = 1.8 * medianFs // horizontal valley: > ~1.5 line heights
    val vThresh = 2.0 * medianFs // vertical valley (column gutter)

    // horizontal split: project to y intervals [y, y+fs]
    val byY = lines.sortBy(l => -l.y)
    var bestGap = 0.0
    var bestIdx = -1
    var minY = byY.head.y
    for (i <- 1 until byY.length) {
      val gap = minY - (byY(i).y + byY(i).fontSize)
      if (gap > bestGap) { bestGap = gap; bestIdx = i }
      minY = math.min(minY, byY(i).y)
    }
    if (bestGap > hThresh && bestIdx > 0) {
      return xyCut(byY.take(bestIdx)) ++ xyCut(byY.drop(bestIdx))
    }

    // vertical split: sweep x intervals
    val byX = lines.sortBy(_.x0)
    var maxX = byX.head.x1
    bestGap = 0.0; bestIdx = -1
    for (i <- 1 until byX.length) {
      val gap = byX(i).x0 - maxX
      if (gap > bestGap) { bestGap = gap; bestIdx = i }
      maxX = math.max(maxX, byX(i).x1)
    }
    if (bestGap > vThresh && bestIdx > 0) {
      return xyCut(byX.take(bestIdx)) ++ xyCut(byX.drop(bestIdx))
    }

    lines.sortBy(l => (-l.y, l.x0, l.start))
  }

  // --- header/footer suppression --------------------------------------------

  private val DigitRun = "\\d+".r

  /** Normalize a header/footer candidate: digits → '#' (catches
    * "Page 3 of 12" patterns varying per page).
    */
  def normalizeHf(s: String): String = DigitRun.replaceAllIn(s.trim, "#")

  /** Drop repeated top/bottom-zone lines on multi-page docs. */
  def suppressHeadersFooters(pages: Vector[Vector[Line]]): Vector[Vector[Line]] = {
    val nPages = pages.count(_.nonEmpty)
    if (nPages < 2) return pages
    def zoneKeys(pg: Vector[Line]): Set[(String, String)] = {
      if (pg.isEmpty) return Set.empty
      val ys = pg.map(_.y)
      val top = ys.max
      val bot = ys.min
      val span = math.max(top - bot, 1.0)
      pg.flatMap { l =>
        val rel = (l.y - bot) / span
        if (rel >= 0.88) Some(("top", normalizeHf(l.text)))
        else if (rel <= 0.12) Some(("bot", normalizeHf(l.text)))
        else None
      }.toSet
    }
    val counts = mutable.Map.empty[(String, String), Int]
    pages.foreach(pg => zoneKeys(pg).foreach(k => counts(k) = counts.getOrElse(k, 0) + 1))
    val repeated = counts.filter { case (_, c) => c >= 2 && c * 2 >= nPages }.keySet
    if (repeated.isEmpty) return pages
    pages.map { pg =>
      if (pg.isEmpty) pg
      else {
        val ys = pg.map(_.y)
        val top = ys.max; val bot = ys.min
        val span = math.max(top - bot, 1.0)
        pg.filterNot { l =>
          val rel = (l.y - bot) / span
          val key = if (rel >= 0.88) Some(("top", normalizeHf(l.text)))
            else if (rel <= 0.12) Some(("bot", normalizeHf(l.text)))
            else None
          key.exists(repeated.contains)
        }
      }
    }
  }

  // --- top-level ------------------------------------------------------------

  private val PageMarkerPrefix = "%%Page:"

  /** Split a multi-page stream on `%%Page:` marker lines; a stream with no
    * marker is one page. Returns [start,end) offsets into `src`.
    * Hand-rolled line scan (a `(?m)^%%Page:.*$` regex costs ~20µs/stream).
    */
  def splitPages(src: String): Vector[(Int, Int)] = {
    // (markerStart, markerEnd) per marker line
    val ms = Vector.newBuilder[(Int, Int)]
    var i = src.indexOf(PageMarkerPrefix)
    while (i >= 0) {
      if (i == 0 || src.charAt(i - 1) == '\n') {
        val nl = src.indexOf('\n', i)
        ms += ((i, if (nl < 0) src.length else nl))
      }
      i = src.indexOf(PageMarkerPrefix, i + 1)
    }
    val markers = ms.result()
    if (markers.isEmpty) return Vector((0, src.length))
    val bounds = markers.map(_._1) :+ src.length
    val head =
      if (src.substring(0, markers.head._1).trim.nonEmpty)
        Vector((0, markers.head._1))
      else Vector.empty
    head ++ markers.indices.map(i => (markers(i)._2, bounds(i + 1)))
  }

  final case class PageText(page: Int, lines: Vector[Line])

  /** One page from a standalone content-stream string (used by the PDF
    * FILE reader, which supplies one decompressed stream per page):
    * lex → lines → x-y cut. Header/footer suppression happens across
    * pages via [[suppressHeadersFooters]].
    */
  def pageFromStream(src: String, page: Int): Vector[Line] =
    xyCut(toLines(runPage(src, 0, src.length), page))

  /** Full pipeline: lex → lines → x-y cut → suppress headers/footers. */
  def extract(src: String): Vector[PageText] = {
    val pages = splitPages(src).zipWithIndex.map { case ((s, e), pg) =>
      xyCut(toLines(runPage(src, s, e), pg))
    }
    suppressHeadersFooters(pages).zipWithIndex.map { case (ls, i) => PageText(i, ls) }
  }

  /** Main text: pages in order, reading-order lines joined "\n". */
  def mainText(src: String): String =
    extract(src).flatMap(_.lines.map(_.text)).mkString("\n")

  // --- S4 layout classification ---------------------------------------------

  private val BulletChars = "•◦▪‣–*"

  /** Layout kind per line — the native analog of the reference's Adobe
    * element-path mapping (`adobe_pdf_parser.py:192-201`: `/H1../H3` →
    * heading, `/L` → list, `/Title` → title, else paragraph). A raw
    * content stream has no structure tree, so the same classes are
    * recovered from the signals it does carry:
    *  - `title`: the document's single largest font size, clearly above
    *    body size (≥ 1.4×), on the first page;
    *  - `heading`: font size noticeably above body (≥ 1.15×);
    *  - `list`: a bullet glyph (or "- ") starting the line;
    *  - `text` otherwise.
    * Body size = the char-weighted modal font size across the document.
    */
  def lineKinds(lines: Vector[Line]): Vector[String] = {
    if (lines.isEmpty) return Vector.empty
    val weights = mutable.Map.empty[Double, Long]
    lines.foreach(l => weights(l.fontSize) =
      weights.getOrElse(l.fontSize, 0L) + l.text.length)
    val bodyFs = weights.maxBy { case (fs, w) => (w, -fs) }._1
    val maxFs = lines.map(_.fontSize).max
    val firstPage = lines.map(_.page).min
    lines.map { l =>
      val t = l.text
      val bullet = t.length >= 2 && BulletChars.indexOf(t.charAt(0)) >= 0 &&
        t.charAt(1) == ' '
      val dash = t.length >= 2 && t.charAt(0) == '-' && t.charAt(1) == ' '
      if (bullet || dash) "list"
      else if (l.page == firstPage && maxFs >= bodyFs * 1.4 && l.fontSize == maxFs)
        "title"
      else if (l.fontSize >= bodyFs * 1.15) "heading"
      else "text"
    }
  }
}
