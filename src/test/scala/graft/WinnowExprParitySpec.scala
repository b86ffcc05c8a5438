package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Set-parity of the fused `graft_winnow` expression with the
  * relational winnowing front it replaced (k-gram transform →
  * posexplode → md5 → conv → window min → distinct, k = 8, w = 4):
  * every document must yield the identical distinct fingerprint-key
  * set, which pins the codepoint k-gram slicing, the 5-byte md5 prefix
  * against `conv(substring(md5(...), 1, 10), 16, 10)`, the rightmost-
  * tie window-min key algebra, and the window-start cutoff.
  */
class WinnowExprParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("graft_winnow equals the relational window-min form per document") {
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), substring(lower(col("text")), 1, 384).as("s"))
      .filter(length(col("s")) >= 11)

    val kg = docs
      .withColumn("g", expr(
        "transform(sequence(1, length(s) - 7), i -> substring(s, i, 8))"))
      .select(col("doc_id"), size(col("g")).as("ng"),
        posexplode(col("g")).as(Seq("p0", "kgs")))
      .select(col("doc_id"), col("ng"), (col("p0") + 1).as("pos"),
        conv(substring(md5(col("kgs")), 1, 10), 16, 10).cast("long").as("h"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, 3)
    val relational = kg
      .withColumn("wkey",
        min(col("h") * lit(2097152L) + (lit(1048575L) - col("pos"))).over(w))
      .filter(col("pos") <= col("ng") - 3)
      .groupBy("doc_id")
      .agg(sort_array(collect_set("wkey")).as("r_keys"))

    val fast = docs.select(col("doc_id"),
      expr("graft_winnow(s)").as("f_keys"))

    val joined = relational.join(fast, "doc_id")
    assert(joined.count() === docs.count())
    val mism = joined.filter(col("r_keys") =!= col("f_keys")).limit(2).collect()
    assert(mism.isEmpty,
      s"winnow expression diverges: ${mism.mkString("; ")}")
  }

  test("graft_winnow honors the k + w - 1 minimum length") {
    graft.functions.GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT size(graft_winnow('abcdefghij')) AS short,
        |       size(graft_winnow('abcdefghijk')) AS exact""".stripMargin).head
    assert(out.getInt(0) === 0, "10 chars < k+w-1 must yield no fingerprints")
    assert(out.getInt(1) === 1, "exactly k+w-1 chars yields one window")
  }
}
