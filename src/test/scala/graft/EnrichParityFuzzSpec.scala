package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-parity fuzz between `TrainingDataQueries.enrichedDocs`' Spark
  * expression and the in-memory `EnrichReplay.text2` the replay specs
  * trust — over generated (doc_id, lang, n_chars, text) rows well beyond
  * the corpus (unknown langs hitting the ELSE marker, zero/huge n_chars,
  * unicode text, md5-decile boundary ids). The corpus-level parity is
  * already pinned against real data at sf0.001/sf0.01; this is the
  * adversarial-input leg (the round-2 fuzz discipline).
  */
class EnrichParityFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Spark enrichment expression == EnrichReplay on adversarial rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val langs = Seq("en", "de", "es", "fr", "zh", "pl", "xx")
    val texts = Seq("", "a", "ż ółw\tcr lf\n", "the and of to is",
      "x" * 300, "wörd wörd wörd", "solo")
    val rows = (0 until 200).map { i =>
      // unique by construction (disjoint ranges), spanning small ids,
      // md5-decile variety, and large ids
      val docId = rnd.nextInt(3) match {
        case 0 => i.toLong
        case 1 => 10000L + i.toLong * 37L
        case _ => 1000000L + i
      }
      (docId, langs(rnd.nextInt(langs.size)),
        Seq(0L, 1L, 7L, 8L, 9L, 300L, 5000L)(rnd.nextInt(7)),
        texts(rnd.nextInt(texts.size)))
    }
    // write as a documents-shaped parquet and run the REAL derivation
    val dir = java.nio.file.Files.createTempDirectory("enrich_fuzz").toString
    rows.toDF("doc_id", "lang", "n_chars", "text")
      .withColumn("source", lit("fuzz"))
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.TrainingDataQueries.enrichedDocs(spark, dir)
      .select("doc_id", "text2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, lang, nChars, text) =>
      val expect = EnrichReplay.text2(id, lang, nChars, text)
      assert(got(id) == expect,
        s"divergence at doc_id=$id lang=$lang n_chars=$nChars text=[$text]:\n" +
          s"spark  =[${got(id).take(120)}...]\nreplay =[${expect.take(120)}...]")
    }
  }
}
