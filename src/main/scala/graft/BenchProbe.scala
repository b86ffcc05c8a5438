package graft

import graft.extract.Extractor
import graft.fixtures.TranscriptGen
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession

/** Scratch profiling main: isolates extraction compute vs pipeline
  * overhead (shuffle, writes, manifest) at two parallelism levels.
  */
object BenchProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]").appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nConvs = args.headOption.map(_.toLong).getOrElse(4000L)
    var s = session(32)
    val dir = "/tmp/probe-transcripts"
    TranscriptGen.transcripts(s, nConvs, numPartitions = 64)
      .write.mode("overwrite").parquet(dir)
    s.stop()

    for (cores <- Seq(8, 32)) runLeg(cores, dir)
  }

  private def runLeg(cores: Int, dir: String): Unit = {
    {
      val spark = session(cores)
      import spark.implicits._
      val turns = spark.read.parquet(dir).as[graft.model.Turn]

      // leg A: pure extraction compute (no shuffle, no write)
      var t0 = System.nanoTime()
      val n1 = turns.mapPartitions(_.map(t =>
        Extractor.extract(t.text).text.length.toLong)).reduce(_ + _)
      val computeSec = (System.nanoTime() - t0) / 1e9

      // leg B: shuffle + sort + extraction, no write
      t0 = System.nanoTime()
      val bucketed = ExtractionPipeline.withBucket(turns, cores * 4)
      val n2 = bucketed.repartition(cores, org.apache.spark.sql.functions.col("bucket"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .as[graft.pipeline.TurnWithBucket]
        .mapPartitions(_.map(t => Extractor.extract(t.text).text.length.toLong))
        .reduce(_ + _)
      val shuffleSec = (System.nanoTime() - t0) / 1e9

      // leg C: phase-by-phase pipeline replica
      import org.apache.spark.sql.functions.col
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val out = s"/tmp/probe-out-$cores"
      t0 = System.nanoTime()
      val waveDf = ExtractionPipeline.withBucket(turns, 64)
        .repartition(cores, col("bucket"))
        .sortWithinPartitions("conv_id", "turn_idx")
        .as[graft.pipeline.TurnWithBucket]
      val extracted = waveDf.map { t =>
        val ex = graft.extract.Extractor.extract(t.text)
        graft.model.ExtractedTurn(t.conv_id, t.turn_idx, t.role, t.tool, t.ts, ex.kind,
          ex.text, ex.spans.map(_.start).toArray, ex.spans.map(_.end).toArray,
          ex.spans.map(_.label).toArray, ex.blockLens.toArray,
          ex.bytesParsed, ex.skipReason, t.bucket)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nExtracted = extracted.count()
      val persistSec = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      extracted.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$out/extracted")
      val writeExtSec = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      def mkChunks = extracted.flatMap { e =>
        graft.text.Chunker.splitTextWithOverlap(e.text, 512, 50)
          .zipWithIndex.map { case (c, i) =>
            graft.model.TurnChunk(e.conv_id, e.turn_idx, i, c.content,
              c.start, c.end, e.bucket)
          }
      }
      val nChunks = mkChunks.count()
      val chunkOnlySec = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      mkChunks.write.mode("overwrite").parquet(s"$out/chunks-flat")
      val flatWriteSec = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      mkChunks.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$out/chunks")
      val chunkSec = (System.nanoTime() - t0) / 1e9
      extracted.unpersist()

      println(f"PROBE cores=$cores turns=$nExtracted " +
        f"compute=$computeSec%.1fs shuffle+compute=$shuffleSec%.1fs " +
        f"persist=$persistSec%.1fs writeExt=$writeExtSec%.1fs chunkOnly=$chunkOnlySec%.1fs " +
        f"flatWrite=$flatWriteSec%.1fs partWrite=$chunkSec%.1fs nChunks=$nChunks " +
        f"(chk $n1 $n2)")
      spark.stop()
    }
  }
}
