package graft.extract

/** ToUnicode CMap decoding for CID-coded PDF text.
  *
  * Real-world PDFs (e.g. the reference's own sample
  * `data/raw/WARTA_OWU_...pdf`, the document pinned by
  * `tests/test_parser_properties.py:37-44`) subset their fonts and show
  * text as font-local glyph codes (Identity-H style). Decoding the raw
  * string bytes as Latin-1 — what a naive extractor does — yields
  * garbage; the character mapping lives in each font's `/ToUnicode`
  * CMap stream (`beginbfchar`/`beginbfrange`, PDF 32000-1 §9.10.3).
  *
  * This layer keeps the golden-locked content-stream state machine
  * ([[Pdf]]) untouched: it resolves the object graph
  * (page → `/Resources` → `/Font` → `/ToUnicode`) with the same
  * xref-free tolerance as [[PdfFile]], then REWRITES each content
  * stream — tracking `Tf` font selections and remapping every literal
  * and hex string through the active font's CMap — before the stream
  * is parsed. Files without `/ToUnicode` (all synthetic fixtures) are
  * untouched, byte for byte.
  */
object CidDecode {

  /** A parsed ToUnicode CMap, split by source-code byte length.
    * Generators routinely declare a 2-byte codespace and then emit
    * 1-byte `bfchar` sources (the WARTA file does both in one
    * document), so the hex-digit count of each source code — not the
    * codespace — decides its length.
    */
  final case class CMap(map1: Map[Int, String], map2: Map[Int, String]) {
    def isEmpty: Boolean = map1.isEmpty && map2.isEmpty
  }

  private val HexPair = """<([0-9A-Fa-f]+)>""".r
  private val BfCharSec = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRangeSec = """(?s)beginbfrange(.*?)endbfrange""".r
  private val RangeArr = """(?s)<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]""".r
  private val RangeOne =
    """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r

  /** Destination hex is UTF-16BE — possibly several chars (ligatures). */
  private def dstText(hex: String): String = {
    val sb = new java.lang.StringBuilder(hex.length / 4 + 1)
    var i = 0
    while (i + 4 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    if (i < hex.length) // odd tail: treat as a short code
      sb.append(Integer.parseInt(hex.substring(i), 16).toChar)
    sb.toString
  }

  /** Parse `beginbfchar`/`beginbfrange` sections of one CMap stream. */
  def parseCmap(src: String): CMap = {
    var m1 = Map.empty[Int, String]
    var m2 = Map.empty[Int, String]
    // the hex-digit count of the SOURCE code decides 1- vs 2-byte
    def put(code: Int, srcHexLen: Int, dst: String): Unit =
      if (srcHexLen <= 2) m1 += code -> dst else m2 += code -> dst
    BfCharSec.findAllMatchIn(src).foreach { sec =>
      val toks = HexPair.findAllMatchIn(sec.group(1)).map(_.group(1)).toVector
      var i = 0
      while (i + 1 < toks.length) {
        put(Integer.parseInt(toks(i), 16), toks(i).length, dstText(toks(i + 1)))
        i += 2
      }
    }
    BfRangeSec.findAllMatchIn(src).foreach { sec =>
      val body = sec.group(1)
      // array form first: <lo> <hi> [<d0> <d1> ...]
      val arrSpans = RangeArr.findAllMatchIn(body).map { m =>
        val lo = Integer.parseInt(m.group(1), 16)
        val dsts = HexPair.findAllMatchIn(m.group(3)).map(_.group(1)).toVector
        dsts.zipWithIndex.foreach { case (d, k) =>
          put(lo + k, m.group(1).length, dstText(d))
        }
        (m.start, m.end)
      }.toVector
      // scalar form, skipping spans the array form consumed
      RangeOne.findAllMatchIn(body).foreach { m =>
        val inside = arrSpans.exists(s => m.start >= s._1 && m.end <= s._2)
        if (!inside) {
          val lo = Integer.parseInt(m.group(1), 16)
          val hi = Integer.parseInt(m.group(2), 16)
          val base = dstText(m.group(3))
          // cap runaway ranges (damaged files): 64k codes max
          var c = lo
          while (c <= hi && c - lo < (1 << 16)) {
            // the range increments the LAST UTF-16 unit (§9.10.3)
            val t =
              if (c == lo) base
              else base.dropRight(1) + (base.last + (c - lo)).toChar
            put(c, m.group(1).length, t)
            c += 1
          }
        }
      }
    }
    CMap(m1, m2)
  }

  private val ObjRe = """(?s)(\d+)\s+\d+\s+obj\b(.{0,8192}?)(?:endobj|stream\b)""".r

  /** All object bodies (dictionary text; stream payloads excluded),
    * keyed by object number — the non-stream complement of
    * [[PdfFile.objects]]. Bodies over 8 KB are clipped: page, resource
    * and font dictionaries are far smaller, and the clip keeps the scan
    * linear on binary-heavy files.
    */
  def objectBodies(raw: String): Map[Int, String] =
    ObjRe.findAllMatchIn(raw).flatMap { m =>
      m.group(1).toIntOption.map(_ -> m.group(2))
    }.toMap

  private val IntRe = """\d+""".r

  /** Expand a `/Type /ObjStm` compressed object stream (PDF 32000-1
    * §7.5.7) into (objNum → body) pairs. PDF ≥ 1.5 writers routinely
    * pack page and font dictionaries here — without this, the
    * object-graph resolution above sees none of them. Layout: the dict
    * declares `/N` object count and `/First` body offset; the payload
    * opens with N (objnum, offset) integer pairs, bodies concatenated
    * from `First` on, no `obj/endobj` wrappers. Tolerant of damage:
    * short headers or out-of-range offsets yield fewer (or zero)
    * bodies, never a throw.
    */
  def parseObjStm(dict: String, payload: String): Seq[(Int, String)] = {
    val n = """/N\s+(\d+)""".r.findFirstMatchIn(dict)
      .flatMap(_.group(1).toIntOption).filter(_ > 0)
    val first = """/First\s+(\d+)""".r.findFirstMatchIn(dict)
      .flatMap(_.group(1).toIntOption)
    (n, first) match {
      case (Some(cnt), Some(f)) if f > 0 && f <= payload.length =>
        val ints = IntRe.findAllIn(payload.substring(0, f))
          .flatMap(_.toIntOption).take(2 * cnt).toVector
        val pairs = ints.grouped(2).collect { case Vector(o, off) => (o, off) }.toVector
        pairs.zipWithIndex.flatMap { case ((objNum, off), k) =>
          val s = f.toLong + off
          if (s >= payload.length || s < 0) None
          else {
            val e = pairs.lift(k + 1).map(p => math.min(f.toLong + p._2, payload.length))
              .getOrElse(payload.length.toLong)
            if (e <= s) None else Some(objNum -> payload.substring(s.toInt, e.toInt))
          }
        }
      case _ => Nil
    }
  }

  private val RefAfter = """(\d+)\s+\d+\s+R""".r

  private def refAfter(body: String, key: String): Option[Int] = {
    val i = body.indexOf(key)
    if (i < 0) None
    else RefAfter.findFirstMatchIn(body.substring(i + key.length,
      math.min(body.length, i + key.length + 32))).flatMap(_.group(1).toIntOption)
  }

  private val NameRef = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r

  /** `/Font << /F1 12 0 R ... >>` map from a resources body (the font
    * dict may itself be an indirect reference).
    */
  private def fontRefs(resBody: String, bodies: Map[Int, String]): Map[String, Int] = {
    val i = resBody.indexOf("/Font")
    if (i < 0) Map.empty
    else {
      val after = resBody.substring(i + 5)
      val flat =
        if (after.dropWhile(_.isWhitespace).startsWith("<<"))
          after.take(2048)
        else refAfter(resBody, "/Font").flatMap(bodies.get).getOrElse("")
      // stop at the submap's closing >> so sibling resources don't leak in
      val end = flat.indexOf(">>")
      val scope = if (end >= 0) flat.take(end) else flat
      NameRef.findAllMatchIn(scope).flatMap { m =>
        m.group(2).toIntOption.map(m.group(1) -> _)
      }.toMap
    }
  }

  /** Per-content-stream-object font→CMap tables for a whole file.
    * Covers both page content streams (via `/Type /Page` → `/Contents`
    * + `/Resources`) and form XObjects (their `/Resources` live in the
    * stream's own dictionary).
    */
  def fontTables(raw: String,
      streamDicts: Map[Int, String],
      cmaps: Map[Int, CMap],
      objStmBodies: Map[Int, String] = Map.empty): Map[Int, Map[String, CMap]] = {
    if (cmaps.isEmpty) return Map.empty
    // ObjStm-packed dicts lose ties on collision to plain objects
    // (incremental updates append plain objects that supersede)
    val bodies = objStmBodies ++ objectBodies(raw)
    def toCmaps(refs: Map[String, Int]): Map[String, CMap] =
      refs.flatMap { case (name, fontObj) =>
        bodies.get(fontObj)
          .flatMap(fb => refAfter(fb, "/ToUnicode"))
          // composite fonts nest the coded font under /DescendantFonts,
          // but /ToUnicode sits on the top-level dict — direct hit or miss
          .flatMap(cmaps.get)
          .map(name -> _)
      }
    val out = Map.newBuilder[Int, Map[String, CMap]]
    // pages
    bodies.foreach { case (_, body) =>
      if ("""/Type\s*/Page\b""".r.findFirstIn(body).isDefined) {
        val resBody = {
          val i = body.indexOf("/Resources")
          if (i < 0) ""
          else if (body.substring(i + 10).dropWhile(_.isWhitespace).startsWith("<<"))
            body.substring(i)
          else refAfter(body, "/Resources").flatMap(bodies.get).getOrElse("")
        }
        val fonts = toCmaps(fontRefs(resBody, bodies))
        if (fonts.nonEmpty) {
          // /Contents: single ref or array of refs
          val ci = body.indexOf("/Contents")
          if (ci >= 0) {
            val tail = body.substring(ci + 9, math.min(body.length, ci + 9 + 256))
            RefAfter.findAllMatchIn(tail.takeWhile(_ != '/') match {
              case t if t.contains('[') => t
              case t => t.take(32)
            }).flatMap(_.group(1).toIntOption).foreach(c => out += c -> fonts)
          }
        }
      }
    }
    // form XObjects: resources inline in the stream dict
    streamDicts.foreach { case (objNum, dict) =>
      if (dict.contains("/Resources")) {
        val fonts = toCmaps(fontRefs(dict.substring(dict.indexOf("/Resources")), bodies))
        if (fonts.nonEmpty) out += objNum -> fonts
      }
    }
    out.result()
  }

  /** Greedy remap of raw string bytes (chars 0–255) through a CMap:
    * 1-byte codes first, then 2-byte, identity on misses (keeps
    * spacing for partially-subset fonts).
    */
  def remap(rawStr: String, cm: CMap): String = {
    val sb = new java.lang.StringBuilder(rawStr.length)
    var i = 0
    val n = rawStr.length
    while (i < n) {
      val b0 = rawStr.charAt(i) & 0xFF
      cm.map1.get(b0) match {
        case Some(t) => sb.append(t); i += 1
        case None =>
          if (i + 1 < n && cm.map2.nonEmpty) {
            val code = (b0 << 8) | (rawStr.charAt(i + 1) & 0xFF)
            cm.map2.get(code) match {
              case Some(t) => sb.append(t); i += 2
              case None => sb.append(rawStr.charAt(i)); i += 1
            }
          } else { sb.append(rawStr.charAt(i)); i += 1 }
      }
    }
    sb.toString
  }

  private def escapeLiteral(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' || c == '(' || c == ')') { sb.append('\\'); sb.append(c) }
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Rewrite a content stream: track `Tf` font selections, remap every
    * literal and hex string shown under a CMap-bearing font, and emit
    * the result as an escaped literal. Everything else — operators,
    * numbers, inline dicts — passes through verbatim, so a stream whose
    * fonts carry no CMaps round-trips unchanged.
    */
  def rewrite(stream: String, fonts: Map[String, CMap]): String = {
    if (fonts.isEmpty) return stream
    val out = new java.lang.StringBuilder(stream.length + 64)
    val strSb = new java.lang.StringBuilder(64)
    var cur: CMap = null
    // the font is graphics state: q/Q save and restore it (§8.4.2)
    var saved = List.empty[CMap]
    var lastName: String = null
    var i = 0
    val n = stream.length

    // decode one literal string starting at `(`; returns end index
    def literal(from: Int): Int = {
      strSb.setLength(0)
      var j = from + 1
      var depth = 1
      while (j < n && depth > 0) {
        val c = stream.charAt(j)
        if (c == '\\' && j + 1 < n) {
          stream.charAt(j + 1) match {
            case 'n' => strSb.append('\n'); j += 2
            case 'r' => strSb.append('\r'); j += 2
            case 't' => strSb.append('\t'); j += 2
            case 'b' => strSb.append('\b'); j += 2
            case 'f' => strSb.append('\f'); j += 2
            case '(' => strSb.append('('); j += 2
            case ')' => strSb.append(')'); j += 2
            case '\\' => strSb.append('\\'); j += 2
            case '\n' => j += 2
            case d if d >= '0' && d <= '7' =>
              var k = j + 1
              var v = 0
              while (k < n && k < j + 4 && stream.charAt(k) >= '0' && stream.charAt(k) <= '7') {
                v = v * 8 + (stream.charAt(k) - '0'); k += 1
              }
              strSb.append(v.toChar); j = k
            case other => strSb.append(other); j += 2
          }
        } else if (c == '(') { depth += 1; strSb.append(c); j += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) strSb.append(c); j += 1 }
        else { strSb.append(c); j += 1 }
      }
      j
    }

    while (i < n) {
      val c = stream.charAt(i)
      if (c == '(') {
        val end = literal(i)
        if (cur != null) {
          out.append('(').append(escapeLiteral(remap(strSb.toString, cur))).append(')')
        } else out.append(stream, i, end)
        i = end
      } else if (c == '<') {
        if (i + 1 < n && stream.charAt(i + 1) == '<') {
          // inline dict: copy verbatim to the matching >>
          var depth = 0
          var j = i
          while (j < n) {
            if (stream.charAt(j) == '<' && j + 1 < n && stream.charAt(j + 1) == '<') { depth += 1; j += 2 }
            else if (stream.charAt(j) == '>' && j + 1 < n && stream.charAt(j + 1) == '>') {
              depth -= 1; j += 2
              if (depth == 0) { out.append(stream, i, j); i = j; j = n + 1 }
            } else j += 1
          }
          if (j == n) { out.append(stream, i, n); i = n }
        } else {
          var j = i + 1
          strSb.setLength(0)
          var have = 0
          var pend = 0
          while (j < n && stream.charAt(j) != '>') {
            val h = stream.charAt(j)
            val v =
              if (h >= '0' && h <= '9') h - '0'
              else if (h >= 'a' && h <= 'f') h - 'a' + 10
              else if (h >= 'A' && h <= 'F') h - 'A' + 10
              else -1
            if (v >= 0) {
              if (have == 0) { pend = v; have = 1 }
              else { strSb.append(((pend << 4) | v).toChar); have = 0 }
            }
            j += 1
          }
          if (have == 1) strSb.append((pend << 4).toChar)
          val end = if (j < n) j + 1 else j
          if (cur != null) {
            out.append('(').append(escapeLiteral(remap(strSb.toString, cur))).append(')')
          } else out.append(stream, i, end)
          i = end
        }
      } else if (c == '/') {
        var j = i + 1
        while (j < n && !stream.charAt(j).isWhitespace &&
          "()<>[]{}/%".indexOf(stream.charAt(j)) < 0) j += 1
        lastName = stream.substring(i + 1, j)
        out.append(stream, i, j)
        i = j
      } else if (c == 'T' && i + 1 < n && stream.charAt(i + 1) == 'f' &&
          (i + 2 >= n || !stream.charAt(i + 2).isLetterOrDigit)) {
        cur = if (lastName != null) fonts.getOrElse(lastName, null) else null
        out.append("Tf")
        i += 2
      } else if (c == 'q' && (i == 0 || !stream.charAt(i - 1).isLetterOrDigit) &&
          (i + 1 >= n || !stream.charAt(i + 1).isLetterOrDigit)) {
        saved = cur :: saved
        out.append(c)
        i += 1
      } else if (c == 'Q' && (i == 0 || !stream.charAt(i - 1).isLetterOrDigit) &&
          (i + 1 >= n || !stream.charAt(i + 1).isLetterOrDigit)) {
        saved match {
          case h :: t => cur = h; saved = t
          case Nil =>
        }
        out.append(c)
        i += 1
      } else if (c == '%') {
        var j = i
        while (j < n && stream.charAt(j) != '\n' && stream.charAt(j) != '\r') j += 1
        out.append(stream, i, j)
        i = j
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }
}
