package graft

import graft.fixtures.TranscriptGen
import graft.model.Turn
import graft.pipeline.{ExtractionPipeline, Ingestion, Status}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Property 25 (processing status accuracy) and Property 26 (error
  * logging completeness) — `tests/test_document_service_properties.py:
  * 432,536` — over the staged stores: status is a VIEW of which stage
  * tables hold the document, so it cannot drift from reality, and every
  * skipped turn is a queryable error row with document id, stage,
  * error type and timestamp.
  */
class StatusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val outDir: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("status").toString
    val good = (0 until 6).flatMap(i => TranscriptGen.conversation(7L, i.toLong))
    // a poison document: every turn blank -> extracted with skip reasons,
    // zero chunks (the reference's parser-stage failure)
    val poison = (0 until 3).map(i =>
      Turn("conv-poison", i, "user", "   ", "", good.head.ts))
    ExtractionPipeline.run(spark, spark.createDataset(good ++ poison),
      ExtractionPipeline.Config(out, nBuckets = 4, waves = 1, resume = false))
    out
  }

  test("P25: status reflects the stage tables — embedding before, completed after ingest") {
    val before = Status.of(spark, outDir).collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[String]("status")).toMap
    assert(before("conv-poison") == "failed")
    val goodBefore = before.filter(_._1 != "conv-poison")
    assert(goodBefore.nonEmpty && goodBefore.values.forall(_ == "embedding"),
      s"chunked but not embedded yet: $goodBefore")

    Ingestion.run(spark, outDir)
    val after = Status.of(spark, outDir).collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[String]("status")).toMap
    assert(after("conv-poison") == "failed", "a failed doc never completes")
    assert(after.filter(_._1 != "conv-poison").values.forall(_ == "completed"))
  }

  test("P26: every skipped turn is an error row with doc id, stage, type, timestamp") {
    val errs = Status.errors(spark, outDir).collect()
    val poison = errs.filter(_.getAs[String]("conv_id") == "conv-poison")
    assert(poison.length == 3, "one error row per failed turn")
    poison.foreach { e =>
      assert(e.getAs[Int]("turn_idx") >= 0)
      assert(e.getAs[String]("stage") == "extract")
      assert(Set("empty", "blank", "parse_error", "too_large")(e.getAs[String]("error")))
      assert(e.getAs[java.sql.Timestamp]("ts") != null)
    }
    // completeness: error rows + clean rows partition the extracted table
    val ex = spark.read.parquet(ExtractionPipeline.extractedDir(outDir))
    assert(errs.length ==
      ex.filter(org.apache.spark.sql.functions.col("skip_reason") =!= "").count())
  }
}
