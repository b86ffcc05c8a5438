package graft

import graft.extract.{Extractor, Pdf}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Grammar-driven SEMANTIC fuzz for the hand-built extractors — stronger
  * than the never-throws fuzz: generated documents with a known expected
  * reading carry their own oracle.
  *
  *  - single-column PDFs (descending y) must extract byte-exactly in order
  *  - two-column PDFs must read the left column fully before the right
  *    (the x-y cut's vertical-valley split)
  *  - any VALID operator stream conserves alphanumeric content: nothing
  *    shown is lost, nothing is hallucinated (single page, so no
  *    header/footer suppression interferes)
  *  - well-formed random HTML never hallucinates tokens that were not in a
  *    text node, and script/style content never leaks into the output
  */
class ExtractorSemanticFuzzSpec extends AnyFunSuite {

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
    "november", "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def alnum(s: String): Map[Char, Int] =
    s.filter(_.isLetterOrDigit).groupBy(identity).map { case (c, g) => c -> g.length }

  test("single-column PDFs extract byte-exactly in reading order") {
    val rnd = new Random(2026)
    for (_ <- 0 until 40) {
      val n = 2 + rnd.nextInt(12)
      val lines = (0 until n).map(i =>
        (0 until 1 + rnd.nextInt(4)).map(_ => words(rnd.nextInt(words.size)))
          .mkString(" "))
      val body = lines.zipWithIndex.map { case (t, i) =>
        val y = 700 - i * 14 // uniform leading: no horizontal valley
        s"1 0 0 1 72 $y Tm (${esc(t)}) Tj"
      }.mkString("BT\n", "\n", "\nET")
      assert(Pdf.mainText(body) == lines.mkString("\n"),
        s"order mismatch for:\n$body")
    }
  }

  test("two-column PDFs read the left column fully before the right") {
    val rnd = new Random(77)
    for (_ <- 0 until 25) {
      val nl = 2 + rnd.nextInt(6)
      val nr = 2 + rnd.nextInt(6)
      val lt = (0 until nl).map(i => s"left${words(rnd.nextInt(words.size))}$i")
      val rt = (0 until nr).map(i => s"right${words(rnd.nextInt(words.size))}$i")
      val draws = lt.zipWithIndex.map { case (t, i) =>
        s"1 0 0 1 50 ${700 - i * 14} Tm (${esc(t)}) Tj"
      } ++ rt.zipWithIndex.map { case (t, i) =>
        s"1 0 0 1 400 ${700 - i * 14} Tm (${esc(t)}) Tj"
      }
      // interleave the draw order so ONLY geometry can reconstruct it
      val body = rnd.shuffle(draws).mkString("BT\n", "\n", "\nET")
      assert(Pdf.mainText(body) == (lt ++ rt).mkString("\n"),
        s"column order mismatch for:\n$body")
    }
  }

  test("valid operator streams conserve alphanumeric content exactly") {
    val rnd = new Random(4242)
    for (_ <- 0 until 60) {
      val shown = scala.collection.mutable.ArrayBuffer.empty[String]
      val ops = scala.collection.mutable.ArrayBuffer.empty[String]
      ops += "BT"
      ops += "/F1 12 Tf"
      ops += s"1 0 0 1 72 ${600 + rnd.nextInt(200)} Tm"
      for (_ <- 0 until 3 + rnd.nextInt(15)) {
        rnd.nextInt(6) match {
          case 0 =>
            val t = words(rnd.nextInt(words.size)); shown += t
            ops += s"(${esc(t)}) Tj"
          case 1 => // TJ array with kerning numbers
            val ts = (0 until 1 + rnd.nextInt(3)).map(_ => words(rnd.nextInt(words.size)))
            ts.foreach(shown += _)
            ops += ts.map(t => s"(${esc(t)}) ${-rnd.nextInt(900)}")
              .mkString("[", " ", "] TJ")
          case 2 => ops += s"0 ${-10 - rnd.nextInt(8)} Td"
          case 3 => ops += "T*"
          case 4 =>
            val t = words(rnd.nextInt(words.size)); shown += t
            ops += s"(${esc(t)}) '"
          case 5 => ops += s"${rnd.nextInt(20)} TL"
        }
      }
      ops += "ET"
      val out = Pdf.mainText(ops.mkString("\n"))
      assert(alnum(out) == alnum(shown.mkString),
        s"content not conserved:\nshown=${shown.mkString(" ")}\nout=$out")
    }
  }

  test("PDF spans are faithful: every line's words sit inside its source span") {
    val rnd = new Random(314)
    for (_ <- 0 until 25) {
      val n = 2 + rnd.nextInt(10)
      val texts = (0 until n).map(_ =>
        (0 until 1 + rnd.nextInt(3)).map(_ => words(rnd.nextInt(words.size)))
          .mkString(" "))
      val src = texts.zipWithIndex.map { case (t, i) =>
        s"1 0 0 1 72 ${700 - i * 14} Tm ($t) Tj"
      }.mkString("BT\n", "\n", "\nET")
      Pdf.extract(src).flatMap(_.lines).foreach { l =>
        assert(l.start >= 0 && l.end <= src.length && l.start < l.end)
        val window = src.substring(l.start, l.end)
        l.text.split(' ').filter(_.nonEmpty).foreach(w =>
          assert(window.contains(w),
            s"word '$w' of line '${l.text}' not inside its span window '$window'"))
      }
    }
  }

  test("HTML comments and entity-encoded text: decode, never leak") {
    val rnd = new Random(271)
    for (_ <- 0 until 30) {
      val expect = scala.collection.mutable.Set.empty[String]
      val sb = new StringBuilder("<html><body>")
      // paragraphs are >16 words so the Boilerpipe NumWordsRules classifier
      // keeps them — this test is about decode/leak fidelity, not density
      def filler(): String =
        (0 until 18).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      for (_ <- 0 until 4 + rnd.nextInt(6)) rnd.nextInt(4) match {
        case 0 => // plain text node
          val w = words(rnd.nextInt(words.size)) + rnd.nextInt(100)
          val pad = filler(); pad.split(' ').foreach(expect += _)
          expect += w
          sb.append("<p>").append(w).append(' ').append(pad).append("</p>")
        case 1 => // entity-encoded first letter: must decode to the word
          val w = words(rnd.nextInt(words.size))
          val pad = filler(); pad.split(' ').foreach(expect += _)
          expect += w
          sb.append("<p>&#").append(w.head.toInt).append(';')
            .append(w.tail).append(' ').append(pad).append("</p>")
        case 2 => // comment with markup inside: must vanish entirely
          sb.append("<!-- commentpoison <div>ghost</div> -->")
        case 3 => // named entities around a word
          val w = words(rnd.nextInt(words.size))
          val pad = filler(); pad.split(' ').foreach(expect += _)
          expect += w
          sb.append("<p>&lt;").append(w).append("&gt; &amp; ")
            .append(pad).append("</p>")
      }
      sb.append("</body></html>")
      val ex = Extractor.extract(sb.toString)
      val outTokens = ex.text.split("[^A-Za-z0-9]+").filter(_.nonEmpty).toSet
      outTokens.foreach(tok => assert(expect.contains(tok),
        s"unexpected token '$tok' from:\n${sb.toString}"))
      assert(!ex.text.contains("commentpoison") && !ex.text.contains("ghost"))
      // every entity-decoded word must actually survive extraction
      expect.foreach(w => assert(outTokens.contains(w),
        s"expected word '$w' lost from:\n${sb.toString}\ngot: ${ex.text}"))
    }
  }

  test("well-formed HTML: no hallucinated tokens, script/style never leak") {
    val rnd = new Random(99)
    val blockTags = Vector("div", "p", "section", "article", "td", "li", "h2")
    for (_ <- 0 until 40) {
      val textWords = scala.collection.mutable.Set.empty[String]
      val sb = new StringBuilder("<html><body>")
      def node(depth: Int): Unit = {
        if (depth > 4 || rnd.nextInt(4) == 0) {
          val w = words(rnd.nextInt(words.size)) + rnd.nextInt(1000)
          textWords += w
          sb.append(w).append(' ')
        } else rnd.nextInt(8) match {
          case 0 =>
            sb.append("<script>var poison").append(rnd.nextInt(1000))
              .append(" = 1;</script>")
          case 1 =>
            sb.append("<style>.poison").append(rnd.nextInt(1000))
              .append(" { color: red }</style>")
          case _ =>
            val t = blockTags(rnd.nextInt(blockTags.size))
            sb.append(s"""<$t class="c${rnd.nextInt(10)}">""")
            (0 until 1 + rnd.nextInt(3)).foreach(_ => node(depth + 1))
            sb.append(s"</$t>")
        }
      }
      (0 until 3 + rnd.nextInt(5)).foreach(_ => node(0))
      sb.append("</body></html>")
      val ex = Extractor.extract(sb.toString)
      val outTokens = ex.text.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
      outTokens.foreach { tok =>
        assert(textWords.contains(tok),
          s"hallucinated token '$tok' not in any text node:\n${sb.toString.take(500)}")
        assert(!tok.contains("poison"), s"script/style leaked: $tok")
      }
      ex.spans.foreach(sp => assert(sp.start >= 0 && sp.end <= sb.length))
    }
  }
}
