package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Processing-status and error-log views over the staged stores — the
  * reference's Property 25 "processing status accuracy" and Property 26
  * "error logging completeness" (`tests/test_document_service_properties
  * .py:432,536`; status enum at `app/models/document.py` —
  * uploaded/parsing/embedding/completed/failed), re-expressed for a
  * batch table engine: status is not mutable service state but a VIEW
  * derived from which stage tables hold the document, so it is always
  * accurate by construction (Requirement 9.4) and costs one
  * column-pruned aggregate per stage table.
  */
object Status {

  /** Per-conversation processing stage:
    *  - `failed`     — extracted, but every turn skipped (the document
    *                   produced no text; `skip_reason` says why)
    *  - `parsing`    — some turns extracted, chunks not yet written
    *  - `embedding`  — chunked, embeddings not yet written
    *  - `completed`  — embeddings present (the ingestion tail wrote its
    *                   stores atomically after this)
    * A conversation in none of the tables is simply absent — the
    * "uploaded" stage lives in [[FileStore]] before the job runs.
    */
  /** A stage table that does not exist yet IS the signal that no
    * document reached that stage — read it as empty, not as an error.
    */
  private def convIds(spark: SparkSession, dir: String): DataFrame =
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      spark.read.parquet(dir).select("conv_id").distinct()
    else {
      import spark.implicits._
      Seq.empty[String].toDF("conv_id")
    }

  def of(spark: SparkSession, outDir: String): DataFrame = {
    val ex = spark.read.parquet(ExtractionPipeline.extractedDir(outDir))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("turns"),
        sum(when(col("skip_reason") === "", 1L).otherwise(0L)).as("ok_turns"))
    val ch = convIds(spark, ExtractionPipeline.chunksDir(outDir))
      .withColumn("chunked", lit(true))
    val em = convIds(spark, Ingestion.embeddingsDir(outDir))
      .withColumn("embedded", lit(true))
    ex.join(ch, Seq("conv_id"), "left").join(em, Seq("conv_id"), "left")
      .select(col("conv_id"),
        when(col("ok_turns") === 0L, "failed")
          .when(col("embedded"), "completed")
          .when(col("chunked"), "embedding")
          .otherwise("parsing").as("status"),
        col("turns"), col("ok_turns"))
  }

  /** Error log (Property 26): one row per skipped turn with full
    * context — document id, stage, error type, and the commit
    * timestamp the manifest recorded. Requirement 10.1/10.4's "log
    * entry containing timestamp, error type, and contextual
    * information", as a queryable table instead of a log line.
    */
  def errors(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(ExtractionPipeline.extractedDir(outDir))
      .filter(col("skip_reason") =!= "")
      .select(col("conv_id"), col("turn_idx"),
        lit("extract").as("stage"),
        col("skip_reason").as("error"),
        col("ts"))
}
