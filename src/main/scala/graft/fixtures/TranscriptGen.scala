package graft.fixtures

import graft.model.Turn
import org.apache.spark.sql.{Dataset, SparkSession}

import java.sql.Timestamp
import scala.util.Random

/** Deterministic synthetic transcript generator (FIXTURES.md §1): the
  * input table of the north rule, shaped exactly per BASELINE.json
  * `input_hint` — `(conv_id, turn_idx, role, text, tool, ts)`.
  *
  * Properties:
  *  - fully deterministic: every turn's payload is a pure function of
  *    (seed, conversation index, turn index) — regeneration at any
  *    parallelism yields identical rows;
  *  - generated DISTRIBUTED: `spark.range(nConvs)` → `flatMap`, one RNG
  *    per conversation, no driver-side loops — scales to arbitrary conv
  *    counts;
  *  - skew: 1% of conversations carry ~100× the median turn count
  *    (exercises the salted-partitioning path);
  *  - payload mix ~60% plain / ~25% HTML / ~15% PDF content streams, each
  *    built to exercise the extractor branches (boilerplate nav/footer,
  *    link-dense sidebars, tables; 2-column PDFs with repeated
  *    headers/footers and out-of-order draw commands; plain text with
  *    no-punctuation and long-sentence chunker edge cases);
  *  - rows are emitted in a scrambled order (ordering recovery is part of
  *    the contract under test).
  *
  * Mirrors the reference's Hypothesis `text_content()` strategy shape
  * (rafalpronko/pdf-parser `tests/test_chunker_properties.py:11-29`:
  * 5–20 words/sentence, bounded sentence counts).
  */
object TranscriptGen {

  val DefaultSeed = 42L

  private val Words = Vector(
    "spark", "catalyst", "shuffle", "partition", "executor", "driver",
    "parquet", "iceberg", "manifest", "snapshot", "lineage", "checkpoint",
    "transcript", "conversation", "extraction", "boilerplate", "density",
    "window", "broadcast", "join", "aggregate", "stream", "batch", "table",
    "column", "schema", "codegen", "tungsten", "skew", "salt", "bucket",
    "anchor", "heading", "section", "paragraph", "sentence", "overlap",
    "chunk", "token", "index", "query", "retrieval", "fusion", "ranking",
    "wynik", "łańcuch", "przykład", "średni", "źródło") // unicode cases

  private val Roles = Vector("user", "assistant", "tool")
  private val Tools = Vector("browser", "pdf_reader", "search")

  /** Stable 64-bit mix (splitmix64 finalizer) — conv seed derivation. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sentence(r: Random, nWords: Int, endPunct: String = "."): String = {
    val ws = (0 until nWords).map { i =>
      val w = Words(r.nextInt(Words.length))
      if (i == 0) w.capitalize else w
    }
    ws.mkString(" ") + endPunct
  }

  /** Plain payload with chunker edge cases mixed in. */
  private[fixtures] def plainText(r: Random): String = {
    r.nextInt(10) match {
      case 0 => // no punctuation at all (whole-text-as-one-sentence branch)
        (0 until 5 + r.nextInt(40)).map(_ => Words(r.nextInt(Words.length))).mkString(" ")
      case 1 => // one giant sentence (word-split fallback branch)
        sentence(r, 220 + r.nextInt(120))
      case 2 => // headings + numbered headings + body
        val parts = Vector.newBuilder[String]
        parts += "INTRODUCTION AND SCOPE"
        parts += sentence(r, 8 + r.nextInt(10))
        parts += s"${1 + r.nextInt(9)}. ${sentence(r, 3 + r.nextInt(4), "")}"
        parts += sentence(r, 10 + r.nextInt(10))
        parts.result().mkString("\n")
      case _ =>
        val n = 1 + r.nextInt(12)
        (0 until n).map { _ =>
          val punct = r.nextInt(10) match {
            case 0 => "!"
            case 1 => "?"
            case _ => "."
          }
          sentence(r, 5 + r.nextInt(16), punct)
        }.mkString(" ")
    }
  }

  /** HTML payload: boilerplate chrome + one main article + optional table. */
  private[fixtures] def htmlText(r: Random): String = {
    val navLinks = (0 until 4 + r.nextInt(4))
      .map(i => s"""<a href="/p$i">${Words(r.nextInt(Words.length))}</a>""").mkString(" ")
    val sidebar = (0 until 3 + r.nextInt(4))
      .map(i => s"""<li><a href="/s$i">${sentence(r, 2 + r.nextInt(2), "")}</a></li>""").mkString
    val paras = (0 until 2 + r.nextInt(4))
      .map(_ => s"<p>${(0 until 2 + r.nextInt(3)).map(_ => sentence(r, 8 + r.nextInt(12))).mkString(" ")}</p>")
      .mkString("\n")
    // in-article plain-text list (S4 "list" kind — link-free so the
    // classifier keeps it, unlike the sidebar's link list)
    val articleList =
      if (r.nextInt(3) == 0)
        "<ul>" + (0 until 2 + r.nextInt(3))
          .map(_ => s"<li>${sentence(r, 6 + r.nextInt(8))}</li>").mkString + "</ul>"
      else ""
    val heading = s"<h1>${sentence(r, 3 + r.nextInt(3), "")}</h1>"
    val table =
      if (r.nextInt(3) == 0) {
        val hdr = "<tr><th>metric</th><th>value</th></tr>"
        val rows = (0 until 2 + r.nextInt(3))
          .map(i => s"<tr><td>${Words(r.nextInt(Words.length))}</td><td>${r.nextInt(1000)}</td></tr>").mkString
        s"<table>$hdr$rows</table>"
      } else ""
    s"""<html><head><title>${Words(r.nextInt(Words.length))}</title>
       |<style>body { color: #222; }</style></head><body>
       |<nav>$navLinks</nav>
       |<header><a href="/">home</a> &gt; section</header>
       |<div class="sidebar"><ul>$sidebar</ul></div>
       |<article>$heading
       |$paras
       |$articleList
       |$table</article>
       |<footer>&copy; 2026 example corp &mdash; <a href="/terms">terms</a> <a href="/privacy">privacy</a></footer>
       |</body></html>""".stripMargin
  }

  /** PDF content-stream payload: 2-3 pages, repeated header/footer,
    * optional 2-column body, draw commands emitted out of order.
    */
  private[fixtures] def pdfText(r: Random): String = {
    val nPages = 2 + r.nextInt(2)
    val twoCol = r.nextBoolean()
    val docTitle = sentence(r, 2 + r.nextInt(2), "").toUpperCase
    val sb = new StringBuilder
    for (pg <- 1 to nPages) {
      sb.append(s"%%Page: $pg\n")
      val body = Vector.newBuilder[(Double, Double, String)]
      // header + footer (suppression targets)
      body += ((72.0, 780.0, docTitle))
      body += ((72.0, 30.0, s"Page $pg of $nPages"))
      // page-1 document title at display size (S4 "title" kind) — drawn
      // before the body items so the 24pt Tf is scoped to it alone
      val titleCmd =
        if (pg == 1)
          f"/F1 24 Tf\n1 0 0 1 72.0 750.0 Tm\n(${sentence(r, 2 + r.nextInt(2), "")}) Tj\n"
        else ""
      // occasional bullet list in the body (S4 "list" kind)
      if (!twoCol && r.nextInt(3) == 0) {
        var y = 500.0
        for (_ <- 0 until 2 + r.nextInt(3)) {
          body += ((90.0, y, "• " + sentence(r, 3 + r.nextInt(4))))
          y -= 16
        }
      }
      if (twoCol) {
        var y = 720.0
        for (_ <- 0 until 6 + r.nextInt(5)) {
          body += ((72.0, y, sentence(r, 4 + r.nextInt(4))))
          y -= 16
        }
        y = 720.0
        for (_ <- 0 until 6 + r.nextInt(5)) {
          body += ((320.0, y, sentence(r, 4 + r.nextInt(4))))
          y -= 16
        }
      } else {
        var y = 720.0
        for (_ <- 0 until 8 + r.nextInt(8)) {
          body += ((72.0, y, sentence(r, 6 + r.nextInt(8))))
          y -= 16
        }
      }
      // emit draw commands in a scrambled deterministic order
      val items = r.shuffle(body.result())
      sb.append("BT\n")
      sb.append(titleCmd)
      sb.append("/F1 12 Tf\n")
      items.foreach { case (x, y, t) =>
        val esc = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        if (r.nextInt(4) == 0)
          sb.append(f"1 0 0 1 $x%.1f $y%.1f Tm\n[($esc)] TJ\n")
        else
          sb.append(f"1 0 0 1 $x%.1f $y%.1f Tm\n($esc) Tj\n")
      }
      sb.append("ET\n")
    }
    sb.toString
  }

  private[fixtures] def payload(r: Random): String = {
    val roll = r.nextInt(100)
    if (roll < 60) plainText(r)
    else if (roll < 85) htmlText(r)
    else pdfText(r)
  }

  /** Turn count for conversation `i`: skewed — 1% of convs get ~100×. */
  def turnCount(seed: Long, i: Long): Int = {
    val r = new Random(mix(seed ^ i))
    if (r.nextInt(100) == 0) 400 + r.nextInt(200) else 2 + r.nextInt(8)
  }

  /** All turns of conversation `i` (pure function of seed and i). */
  def conversation(seed: Long, i: Long): Seq[Turn] = {
    val convId = f"conv-$i%06d"
    val n = turnCount(seed, i)
    val r = new Random(mix(seed ^ (i * 31 + 7)))
    val baseTs = 1700000000000L + i * 3600000L
    (0 until n).map { t =>
      val role = Roles(t % Roles.length)
      val tool = if (role == "tool") Tools(r.nextInt(Tools.length)) else ""
      Turn(convId, t, role, payload(r), tool, new Timestamp(baseTs + t * 13000L))
    }
  }

  /** Distributed generation of `nConvs` conversations; rows scrambled so
    * downstream ordering recovery is actually exercised.
    */
  def transcripts(spark: SparkSession, nConvs: Long,
      seed: Long = DefaultSeed, numPartitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, parts)
      .flatMap(i => conversation(seed, i))
      // scramble row order deterministically (hash-ordered, not time-ordered)
      .orderBy(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx")))
      .as[Turn]
  }
}
