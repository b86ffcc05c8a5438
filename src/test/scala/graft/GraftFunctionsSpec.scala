package graft

import graft.extract.Html
import graft.functions.GraftFunctions
import graft.text.{Chunker, Tokenizer}
import org.scalatest.funsuite.AnyFunSuite

/** The custom Catalyst expressions: SQL-callable, codegen-resident, and
  * semantics identical to the golden-tested pure functions.
  */
class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.register(s)
    s
  }

  private val html =
    """<html><body><nav><a href="/x">menu one two</a></nav>
      |<article><p>The actual content paragraph with plenty of words to be
      |kept by the density classifier in every configuration tested.</p>
      |</article><footer>contact about</footer></body></html>""".stripMargin

  test("graft_html_strip matches Html.mainText and runs inside codegen") {
    import spark.implicits._
    val df = Seq(html, null).toDF("h")
      .selectExpr("graft_html_strip(h) AS main")
    val rows = df.collect()
    assert(rows(0).getString(0) == Html.mainText(html))
    assert(rows(1).isNullAt(0))
    // over a real scan the projection stays inside a WholeStageCodegen
    // span (no fallback-to-interpreted); the local-relation case above
    // even constant-folds, which also exercises eval
    val scanned = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("graft_html_strip(text) AS main")
      .filter("length(main) >= 0")
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_html_strip.*"),
      s"projection not codegen'd:\n$plan")
    assert(scanned.count() > 0)
  }

  test("graft_sentence_split matches Chunker.splitIntoSentences") {
    import spark.implicits._
    val text = "First sentence. Second one! Third? And a tail"
    val got = Seq(text).toDF("t")
      .selectExpr("graft_sentence_split(t) AS s").as[Seq[String]].head()
    assert(got == Chunker.splitIntoSentences(text).map(_.text))
  }

  test("graft_tokenize matches Tokenizer.tokenize incl. fallback") {
    import spark.implicits._
    val texts = Seq(
      "Spark AND the BM25 Index, with Stop-Words!",
      "a an the", // everything filtered → fallback to the plain split
      "Zażółć gęślą jaźń") // unicode word chars survive
    val got = texts.toDF("t")
      .selectExpr("graft_tokenize(t) AS toks").as[Seq[String]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == Tokenizer.tokenize(t), s"for '$t'")
    }
  }

  test("expressions compose with built-ins in one SQL pipeline") {
    import spark.implicits._
    val n = Seq(html).toDF("h")
      .selectExpr("size(graft_tokenize(graft_html_strip(h))) AS n")
      .as[Int].head()
    assert(n > 5)
  }
}
