package graft

import graft.extract.Html
import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractorSpec extends AnyFunSuite {

  test("tokenizer: tags, attributes, entities, comments, raw-text elements") {
    val html =
      """<!DOCTYPE html><html><head><title>T &amp; U</title>
        |<style>p { color: red; } /* <p>not a tag</p> */</style></head>
        |<body><p class="x" id=y data-k>&lt;hello&gt; &#65;&#x42;</p>
        |<!-- <p>comment</p> --><br/><a href="/z">link</a></body></html>""".stripMargin
    var texts = Vector.empty[String]
    var tags = Vector.empty[String]
    Html.tokenize(html) {
      case Html.StartTag(n, attrs, _, _, _) =>
        tags :+= n
        if (n == "p") {
          assert(attrs("class") == "x"); assert(attrs("id") == "y")
          assert(attrs.contains("data-k"))
        }
        if (n == "a") assert(attrs("href") == "/z")
      case Html.Text(t, _, _) => texts :+= t
      case _ =>
    }
    assert(tags.contains("br") && tags.contains("a") && tags.contains("style"))
    // raw-text content of <style> passes through unparsed (no <p> tag event
    // from inside it beyond the body one)
    assert(tags.count(_ == "p") == 1)
    val joined = texts.mkString
    assert(joined.contains("T & U"))
    assert(joined.contains("<hello> AB"))
    assert(!joined.contains("comment"))
  }

  test("table extraction: get_text(strip=True) cell semantics, header row") {
    // reference parses table>tr>td/th with stripped cell text
    // (rag_anything_parser.py:169-202); BeautifulSoup get_text(strip=True)
    // strips each descendant string and joins with ""
    val html =
      """<table><tr><th> Name </th><th>Value</th></tr>
        |<tr><td><b> a </b>1</td><td> 2 </td></tr>
        |<tr><td></td></tr></table>""".stripMargin
    val res = Html.extract(html)
    assert(res.tables.length == 1)
    val t = res.tables.head
    assert(t(0) == Vector("Name", "Value"))
    assert(t(1) == Vector("a1", "2"))
    // row of a single empty cell is kept as [""] (only rows with NO cells
    // are dropped, matching `if cells` at rag_anything_parser.py:191-192)
    assert(t(2) == Vector(""))
  }

  test("boilerplate: nav/header/footer/sidebar dropped, article kept") {
    val html =
      """<html><body>
        |<nav><a href="/a">alpha beta</a> <a href="/b">gamma delta</a></nav>
        |<header><a href="/">home breadcrumb nav</a></header>
        |<div><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></div>
        |<article><h1>The Real Headline</h1>
        |<p>This is the actual main content of the page and it has a good
        |number of words so the density classifier keeps it in the output
        |without any doubt at all.</p>
        |<p>A second solid paragraph with enough words to count as content
        |by the number-of-words rules of the classifier.</p></article>
        |<footer>copyright links about contact</footer>
        |</body></html>""".stripMargin
    val out = Html.mainText(html)
    assert(out.contains("actual main content"))
    assert(out.contains("second solid paragraph"))
    assert(out.contains("The Real Headline"))
    assert(!out.contains("alpha beta"))
    assert(!out.contains("breadcrumb"))
    assert(!out.contains("copyright"))
    assert(!out.contains("one"))
  }

  test("density classifier without article: link-dense blocks dropped") {
    val longText = (1 to 30).map(i => s"word$i").mkString(" ")
    val html =
      s"""<div><a href="/x">$longText</a></div>
         |<p>$longText $longText</p>""".stripMargin
    val res = Html.extract(html)
    val kept = res.content.map(_.text)
    assert(kept.exists(_.startsWith("word1 word2")))
    // the all-anchor block has link density 1.0 → boilerplate
    assert(res.content.forall(_.linkDensity <= 0.34))
  }

  test("whitespace collapsing and blank-block suppression") {
    val html = "<p>  a   b\n\t c  </p><p>   </p><p>d</p><p>e f g</p>"
    val res = Html.extract(html)
    assert(res.blocks.map(_.text) == Vector("a b c", "d", "e f g"))
  }

  test("spans point into the raw source") {
    val html = "<article><p>Alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi rho.</p></article>"
    val res = Html.extract(html)
    assert(res.content.nonEmpty)
    val b = res.content.head
    assert(html.substring(b.start, b.end).contains("Alpha beta"))
  }

  test("title captured") {
    assert(Html.extract("<title> My  Page </title><p>x</p>").title == "My Page")
  }
}
