package graft.text

import graft.text.PyText._

/** Sentence-preserving overlapped chunker — behavioral port of the
  * reference's `SemanticChunker` (rafalpronko/pdf-parser,
  * `app/processing/chunker.py:11-400`), extended with exact source-span
  * tracking (the reference only *estimates* positions,
  * `chunker.py:402-442`; the north rule requires real span offsets).
  *
  * Semantics pinned to the reference:
  *  - sentence split: `re.split("(?<=[.!?])\s+(?=[A-Z])|(?<=[.!?])$")`,
  *    blank pieces dropped, `" "` appended when a sentence does not end in
  *    space/\n/\t, whole text as one sentence when nothing survives
  *    (`chunker.py:272-303`)
  *  - greedy packing: flush when `len(cur)+len(s) > size && cur != ""`;
  *    next chunk starts `overlap_buffer + s` (`chunker.py:241-256`)
  *  - safety: a chunk exceeding `2*size` is word-split, all but the last
  *    piece emitted (`chunker.py:258-264,305-334`)
  *  - overlap: last `overlap` chars, restarted after the max-position of
  *    `". " "! " "? "` if found at index > 0, else after the first `" "`
  *    at index > 0 (`chunker.py:336-368`)
  *  - headings: `len<=100 && (ALLCAPS>3 || ^\d+\.?\s+[A-Z] ||
  *    title-case ratio > 0.6)` (`chunker.py:370-400`)
  *  - structure-aware mode: heading starts a new section; small sections
  *    stay whole; large ones split with `"[Context: {heading}]\n\n"`
  *    prefixed when absent (`chunker.py:106-221`)
  *
  * Length arithmetic counts CODE POINTS, as Python `len` does: BMP-only
  * text (no surrogates) takes the O(1) `.length` fast path, and text
  * containing astral-plane chars (emoji, CJK extensions) switches to
  * code-point counting — parity with the reference is exact for both
  * (astral golden cases in `chunker_cases.json`). Span offsets remain
  * JVM `String` (UTF-16) indices: they address the source string for
  * `substring` extraction downstream, which is their contract.
  *
  * Pure functions: usable in `flatMap`/`mapPartitions` and Catalyst
  * expressions; no Spark imports here.
  */
object Chunker {

  val DefaultChunkSize = 512
  val DefaultOverlap = 50

  /** A sentence piece: `text` as packed (possibly with a synthetic
    * trailing space), `[start,end)` source offsets of the raw piece.
    */
  final case class Sentence(text: String, start: Int, end: Int)

  /** An emitted chunk: `content` exactly as the reference builds it
    * (unstripped), `[start,end)` covering the source sentences that
    * contributed new (non-overlap) content.
    */
  final case class ChunkSpan(content: String, start: Int, end: Int)

  private val NumberedHeading = pyPattern("^\\d+\\.?\\s+[A-Z]")

  @inline private def isSentPunct(c: Char): Boolean =
    c == '.' || c == '!' || c == '?'

  /** `_split_into_sentences` (`chunker.py:272-303`) with source offsets.
    *
    * Hand-rolled scan with the exact semantics of
    * `(?<=[.!?])\s+(?=[A-Z])|(?<=[.!?])$` under UNICODE_CHARACTER_CLASS
    * + UNIX_LINES (the lookaround regex costs ~40% of chunking time):
    *  - split on a whitespace run after sentence punctuation when the
    *    first non-whitespace char is ASCII A-Z (no backtracked shorter
    *    runs can match — the lookahead would land on whitespace);
    *  - the zero-width `$` branch fires at end-of-input, and before a
    *    single trailing `\n`, when the preceding char is punctuation.
    */
  def splitIntoSentences(text: String): Vector[Sentence] = {
    val n = text.length
    val pieces = Vector.newBuilder[(String, Int, Int)]
    var last = 0
    var i = 1
    while (i < n) {
      if (isSentPunct(text.charAt(i - 1)) && pyIsSpace(text.charAt(i))) {
        var j = i + 1
        while (j < n && pyIsSpace(text.charAt(j))) j += 1
        if (j < n && text.charAt(j) >= 'A' && text.charAt(j) <= 'Z') {
          pieces += ((text.substring(last, i), last, i))
          last = j
        }
        i = j + 1
      } else i += 1
    }
    // `$` branch: end-of-input after punctuation…
    if (n > 0 && isSentPunct(text.charAt(n - 1)) && last < n) {
      pieces += ((text.substring(last, n), last, n))
      last = n
    } else if (n > 1 && text.charAt(n - 1) == '\n' &&
      isSentPunct(text.charAt(n - 2)) && last < n - 1) {
      // …or before a single trailing \n (UNIX_LINES `$`)
      pieces += ((text.substring(last, n - 1), last, n - 1))
      last = n - 1
    }
    pieces += ((text.substring(last), last, n))

    val kept = pieces.result().flatMap { case (raw, s, e) =>
      if (pyStrip(raw).nonEmpty) {
        val t =
          if (raw.endsWith(" ") || raw.endsWith("\n") || raw.endsWith("\t")) raw
          else raw + " "
        Some(Sentence(t, s, e))
      } else None
    }
    if (kept.isEmpty && pyStrip(text).nonEmpty)
      Vector(Sentence(text, 0, text.length))
    else kept
  }

  /** `_split_long_text_by_words` (`chunker.py:305-334`). Accumulates in a
    * StringBuilder — `cur + " " + word` per word copied the whole chunk
    * per appended word on this per-turn hot path. Word lengths are code
    * points when the text is astral (Python `len` parity).
    */
  def splitLongTextByWords(text: String, chunkSize: Int): Vector[String] = {
    val astral = hasSurrogate(text)
    @inline def len(s: String): Int = if (astral) cpLen(s) else s.length
    val words = pySplit(text)
    val chunks = Vector.newBuilder[String]
    val sb = new java.lang.StringBuilder
    var sbCp = 0 // Python len of sb content
    var emitted = false
    words.foreach { word =>
      val wl = len(word)
      val testLen = if (sb.length == 0) wl else sbCp + 1 + wl
      if (testLen > chunkSize && sb.length > 0) {
        chunks += sb.toString; emitted = true
        sb.setLength(0); sb.append(word); sbCp = wl
      } else {
        if (sb.length > 0) { sb.append(' '); sbCp += 1 }
        sb.append(word); sbCp += wl
      }
    }
    if (sb.length > 0) { chunks += sb.toString; emitted = true }
    if (emitted) chunks.result() else Vector(text)
  }

  /** `_get_overlap_text` (`chunker.py:336-368`). Note the CPython slice
    * quirk: `text[-0:]` is the whole string, so `overlap == 0` keeps the
    * full text as the candidate tail (observed reference behavior).
    */
  def overlapText(text: String, overlap: Int): String =
    overlapText(text, overlap, hasSurrogate(text))

  /** Astral-aware body: `text[-overlap:]` slices CODE POINTS in Python,
    * so the tail start backs off `overlap` code points (not UTF-16
    * units) when surrogates are present. The separator probes below are
    * BMP chars — their char positions are always code-point boundaries.
    */
  private[text] def overlapText(text: String, overlap: Int, astral: Boolean): String = {
    val n = if (astral) cpLen(text) else text.length
    if (n <= overlap) return text
    val tail =
      if (overlap == 0) text
      else if (!astral) text.substring(text.length - overlap)
      else text.substring(text.offsetByCodePoints(text.length, -overlap))
    val sentenceStart =
      math.max(tail.indexOf(". "), math.max(tail.indexOf("! "), tail.indexOf("? ")))
    if (sentenceStart > 0) tail.substring(sentenceStart + 2)
    else {
      val spacePos = tail.indexOf(" ")
      if (spacePos > 0) tail.substring(spacePos + 1) else tail
    }
  }

  /** `_split_text_with_overlap` (`chunker.py:223-270`) with spans.
    * Content strings are byte-identical to the reference; spans cover the
    * raw source range of the sentences packed into each chunk (word-split
    * safety pieces share their parent accumulation's span).
    */
  def splitTextWithOverlap(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Vector[ChunkSpan] = {
    require(chunkSize > 0, "chunk_size must be positive")
    require(overlap >= 0, "chunk_overlap must be non-negative")
    require(overlap < chunkSize, "chunk_overlap must be less than chunk_size")

    if (text.isEmpty || pyStrip(text).isEmpty) return Vector.empty
    val sentences = splitIntoSentences(text)
    if (sentences.isEmpty) return Vector.empty
    // Python len counts code points; `.length` equals it iff no surrogate
    // is present. One scan here keeps the BMP hot path at zero overhead.
    val astral = hasSurrogate(text)
    @inline def len(s: String): Int = if (astral) cpLen(s) else s.length

    val chunks = Vector.newBuilder[ChunkSpan]
    // accumulate in a StringBuilder: the earlier `cur += s.text` string
    // concat re-copied the whole buffer per sentence — with ~½chunkSize
    // average fill that was O(chunkSize·sentences) churn per turn
    val sb = new java.lang.StringBuilder
    var sbCp = 0 // Python len of sb content (== sb.length when !astral)
    var curStart = -1
    var curEnd = -1

    // the reference recomputes the overlap tail after every sentence
    // (`chunker.py:254-257`) but only CONSUMES it on flush; the invariant
    // "buffer == overlap_text(cur)" holds at every flush, so computing it
    // there is observationally identical and drops a per-sentence scan
    sentences.foreach { s =>
      val sLen = len(s.text)
      if (sbCp + sLen > chunkSize && sb.length > 0) {
        val content = sb.toString
        chunks += ChunkSpan(content, curStart, curEnd)
        sb.setLength(0)
        val ot = overlapText(content, overlap, astral)
        sb.append(ot).append(s.text)
        sbCp = len(ot) + sLen
        curStart = s.start
        curEnd = s.end
      } else {
        sb.append(s.text)
        sbCp += sLen
        if (curStart < 0) curStart = s.start
        curEnd = s.end
      }
      if (sbCp > chunkSize * 2) {
        val wordChunks = splitLongTextByWords(sb.toString, chunkSize)
        wordChunks.dropRight(1).foreach(w => chunks += ChunkSpan(w, curStart, curEnd))
        sb.setLength(0)
        sbCp = 0
        if (wordChunks.nonEmpty) { sb.append(wordChunks.last); sbCp = len(wordChunks.last) }
      }
    }
    val tail = sb.toString
    if (pyStrip(tail).nonEmpty) chunks += ChunkSpan(tail, curStart, curEnd)
    chunks.result()
  }

  private val CharSliceSeps = Vector(". ", ".\n", "! ", "?\n", "? ")

  /** F7 — the multimodal pipeline's ALTERNATE chunker
    * (`multimodal_chunker.py:107-143` `_split_text_with_overlap`): slice
    * `chunkSize` characters, back off to a sentence separator inside the
    * window, step `end - overlap`. Two semantics that differ from the
    * main chunker (F4) and are pinned here:
    *  - separators are probed in the reference's LIST order
    *    `". ", ".\n", "! ", "?\n", "? "` and the FIRST one present wins
    *    (its rightmost occurrence) — not the max position across all;
    *  - pieces are python-stripped at emission and blanks dropped, while
    *    a text short enough to fit returns verbatim (unstripped).
    * Totality divergence (documented): if the back-off would move `start`
    * backward or stall (`end - overlap <= start`, possible when the only
    * separator sits at the window head), CPython's negative-slice wrap
    * makes the reference misbehave; we force forward progress by stepping
    * to `end` (no overlap for that boundary) instead.
    */
  def splitCharSlices(
      text: String,
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Vector[String] = {
    require(chunkSize > 0, "chunk_size must be positive")
    require(overlap >= 0 && overlap < chunkSize, "0 <= overlap < chunk_size")
    // Python slices code points: positions below are cp indices when the
    // text is astral (`off` maps them to UTF-16 substring bounds; the
    // identity when BMP-only). Separators are BMP, so their char
    // positions are always code-point boundaries.
    val astral = hasSurrogate(text)
    val off: Int => Int = if (astral) { val o = cpOffsets(text); o(_) } else identity
    val cpN = if (astral) cpLen(text) else text.length
    // char position -> cp index, only called at separator boundaries
    def cpOf(charIdx: Int): Int =
      if (astral) text.codePointCount(0, charIdx) else charIdx
    if (cpN <= chunkSize) return Vector(text)
    val out = Vector.newBuilder[String]
    var start = 0 // cp index
    var done = false
    while (!done && start < cpN) {
      var end = start + chunkSize // cp index; may exceed cpN (slice clamps below)
      if (end < cpN) {
        var si = 0
        var found = false
        while (!found && si < CharSliceSeps.length) {
          val sep = CharSliceSeps(si)
          // rfind(sep) within [start, end): rightmost i with i+len <= end
          val i = text.lastIndexOf(sep, off(end) - sep.length)
          if (i >= off(start)) { end = cpOf(i) + sep.length; found = true }
          si += 1
        }
      }
      val clamped = math.min(end, cpN)
      val piece = pyStrip(text.substring(off(start), off(clamped)))
      if (piece.nonEmpty) out += piece
      val next = end - overlap
      if (next >= cpN) done = true
      else start = if (next <= start) clamped else next
    }
    out.result()
  }

  /** F7 applied per block (`multimodal_chunker.py:57-105`
    * `create_text_chunks`): a block short enough to fit becomes ONE chunk
    * with its content verbatim; longer blocks emit their char slices.
    * `chunkIndex` runs sequentially across the whole block stream; page
    * carried from the block.
    */
  def chunkCharSlices(
      blocks: Seq[Block],
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Vector[StructChunk] = {
    val out = Vector.newBuilder[StructChunk]
    var idx = 0
    blocks.foreach { b =>
      @inline def len(s: String): Int = if (hasSurrogate(s)) cpLen(s) else s.length
      if (len(b.text) <= chunkSize) {
        out += StructChunk(b.text, b.page, idx,
          sectionBoundary = false, sectionHeading = None, rawLength = len(b.text))
        idx += 1
      } else splitCharSlices(b.text, chunkSize, overlap).foreach { piece =>
        out += StructChunk(piece, b.page, idx,
          sectionBoundary = false, sectionHeading = None, rawLength = len(piece))
        idx += 1
      }
    }
    out.result()
  }

  /** `_is_likely_heading` (`chunker.py:370-400`); font size unused by the
    * reference implementation despite its signature.
    */
  def isLikelyHeading(text: String): Boolean = {
    // Python len(text) > 100 counts code points; cpLen <= length, so the
    // cp scan only runs for texts already over 100 UTF-16 units
    if (text.length > 100 && cpLen(text) > 100) return false
    // len(text) > 3 also counts code points in CPython; an all-caps astral
    // heading of ≤3 code points (4-6 UTF-16 units) must NOT match here
    if (pyIsUpper(text) &&
        (if (hasSurrogate(text)) cpLen(text) else text.length) > 3) return true
    if (NumberedHeading.matcher(text).lookingAt()) return true
    val words = pySplit(text)
    if (words.nonEmpty) {
      val capitalized =
        words.count(w => w.nonEmpty && Character.isUpperCase(w.codePointAt(0)))
      if (capitalized.toDouble / words.length > 0.6) return true
    }
    false
  }

  /** One structured block: a text unit with a page (transcript turns map
    * page := turn_idx when chunking a whole conversation).
    */
  final case class Block(text: String, page: Int)

  /** A structure-aware chunk (`chunk_with_structure`,
    * `chunker.py:106-221`): content stripped as the reference does at
    * emission, sequential `chunkIndex`, section metadata.
    */
  final case class StructChunk(
      content: String,
      page: Int,
      chunkIndex: Int,
      sectionBoundary: Boolean,
      sectionHeading: Option[String],
      rawLength: Int)

  /** `chunk_with_structure` (`chunker.py:106-221`). */
  def chunkWithStructure(
      blocks: Seq[Block],
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Vector[StructChunk] = {
    // group blocks into sections on heading boundaries (chunker.py:137-159)
    var curSection = ""
    var curPage = 0
    var curHeading = ""
    val sections = Vector.newBuilder[(String, Int, String)]
    blocks.foreach { b =>
      val heading = isLikelyHeading(b.text)
      if (heading && curSection.nonEmpty) {
        sections += ((curSection, curPage, curHeading))
        curHeading = b.text
        curSection = b.text + "\n"
        curPage = b.page
      } else {
        if (curSection.isEmpty) curPage = b.page
        if (heading) curHeading = b.text
        curSection += b.text + "\n"
      }
    }
    if (curSection.nonEmpty) sections += ((curSection, curPage, curHeading))

    val out = Vector.newBuilder[StructChunk]
    var idx = 0
    sections.result().foreach { case (sectionText, page, heading) =>
      // Python len = code points (chunk_length metadata + the fits-whole
      // test); zero-cost when the section has no surrogates
      val astral = hasSurrogate(sectionText)
      @inline def len(s: String): Int = if (astral) cpLen(s) else s.length
      if (len(sectionText) <= chunkSize) {
        out += StructChunk(pyStrip(sectionText), page, idx,
          sectionBoundary = true,
          sectionHeading = if (heading.nonEmpty) Some(heading) else None,
          rawLength = len(sectionText))
        idx += 1
      } else {
        splitTextWithOverlap(sectionText, chunkSize, overlap).zipWithIndex.foreach {
          case (sub, subIdx) =>
            val stripped = pyStrip(sub.content)
            val content =
              if (heading.nonEmpty && !stripped.contains(heading))
                s"[Context: $heading]\n\n$stripped"
              else stripped
            out += StructChunk(content, page, idx,
              sectionBoundary = subIdx == 0,
              sectionHeading = if (heading.nonEmpty) Some(heading) else None,
              rawLength = len(sub.content))
            idx += 1
        }
      }
    }
    out.result()
  }

  /** Flat per-document chunking as `chunk_document` (`chunker.py:38-104`):
    * blocks concatenated per page with `"\n"` after each, pages in sorted
    * order, then overlap-split; emitted content is stripped. Page
    * attribution via exact spans (reference estimates, `chunker.py:81-82`).
    */
  def chunkDocument(
      blocks: Seq[Block],
      chunkSize: Int = DefaultChunkSize,
      overlap: Int = DefaultOverlap): Vector[StructChunk] = {
    val byPage = blocks.groupBy(_.page).toVector.sortBy(_._1)
    val full = new StringBuilder
    val boundaries = Vector.newBuilder[(Int, Int, Int)] // (page, start, end)
    byPage.foreach { case (page, bs) =>
      val start = full.length
      bs.foreach(b => full.append(b.text).append('\n'))
      boundaries += ((page, start, full.length))
    }
    val bounds = boundaries.result()
    def pageFor(pos: Int): Int =
      bounds.find(b => b._2 <= pos && pos < b._3).map(_._1)
        .getOrElse(if (bounds.nonEmpty) bounds.head._1 else 0)
    val fullText = full.toString
    val astral = hasSurrogate(fullText)
    splitTextWithOverlap(fullText, chunkSize, overlap).zipWithIndex.map {
      case (c, i) =>
        StructChunk(pyStrip(c.content), pageFor(c.start), i,
          sectionBoundary = false, sectionHeading = None,
          rawLength = if (astral) cpLen(c.content) else c.content.length)
    }
  }
}
