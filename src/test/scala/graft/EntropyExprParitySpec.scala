package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the codegen'd one-pass `graft_char_entropy` expression
  * with the relational explode form it replaced in `q_entropy_filter`
  * (explode chars → (doc, char) counts → per-doc fixed-point sum). The
  * three outputs — codepoint count, alphabet size, fixed-point entropy —
  * must agree EXACTLY for every document, which pins (a) codepoint
  * iteration against Spark's substring unit and (b) StrictMath-based
  * log2 against Spark's own `log2` expression.
  */
class EntropyExprParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("graft_char_entropy equals the relational explode form bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val relational = docs
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(lower(text))), i -> substring(lower(text), i, 1))"))
        .as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(collect_list("c").as("cs"), sum("c").as("n"),
        count(lit(1)).as("n_alphabet"))
      .withColumn("hfp", expr(
        """aggregate(cs, 0L, (acc, c) -> acc +
          |  CAST(floor((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
          |    log2(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))""".stripMargin))
      .select(col("doc_id"), col("n").as("r_n"),
        col("n_alphabet").as("r_alpha"), col("hfp").as("r_hfp"))

    val fast = docs
      .select(col("doc_id"), expr("graft_char_entropy(lower(text))").as("st"))
      .select(col("doc_id"), col("st")(0).as("f_n"),
        col("st")(1).as("f_alpha"), col("st")(2).as("f_hfp"))

    val joined = relational.join(fast, "doc_id")
    assert(joined.count() === docs.count())
    val mism = joined.filter(col("r_n") =!= col("f_n") ||
      col("r_alpha") =!= col("f_alpha") || col("r_hfp") =!= col("f_hfp"))
    val bad = mism.limit(3).collect()
    assert(bad.isEmpty,
      s"expression diverges from relational form: ${bad.mkString("; ")}")
  }

  test("graft_char_entropy handles edge strings") {
    graft.functions.GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT graft_char_entropy('aaaa') AS a,
        |       graft_char_entropy('abab') AS b,
        |       graft_char_entropy('ab') AS c""".stripMargin).head
    // single-symbol string: H = 0
    assert(out.getSeq[Long](0) === Seq(4L, 1L, 0L))
    // two symbols, equal counts: H = 1 bit = 1e6 fixed-point
    assert(out.getSeq[Long](1) === Seq(4L, 2L, 1000000L))
    assert(out.getSeq[Long](2) === Seq(2L, 2L, 1000000L))
  }
}
