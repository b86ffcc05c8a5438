package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession

/** Scratch profiling main: runs ONE pipeline leg with the Spark event log
  * enabled so per-stage wall/task/GC/shuffle numbers can be extracted —
  * used to find where the extract+write phase's non-scaling time goes.
  * Args: cores nConvs [eventLogDir].
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val nConvs = args.lift(1).map(_.toLong).getOrElse(240000L)
    val logDir = args.lift(2).getOrElse("/tmp/graft-eventlog")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(logDir))
    val shm = "/dev/shm/graft-stageprobe"

    val gen = SparkSession.builder()
      .master("local[32]").appName("gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.local.dir", s"$shm/local-gen")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .getOrCreate()
    gen.sparkContext.setLogLevel("WARN")
    val inputDir = s"$shm/transcripts"
    TranscriptGen.transcripts(gen, nConvs, numPartitions = 64)
      .write.mode("overwrite").parquet(inputDir)
    gen.stop()

    val s = SparkSession.builder()
      .master(s"local[$cores]").appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.local.dir", s"$shm/local")
      .config("spark.eventLog.enabled", sys.env.getOrElse("PROBE_EVENTLOG", "true"))
      .config("spark.eventLog.dir", logDir)
      .getOrCreate()
    import s.implicits._
    s.sparkContext.setLogLevel("WARN")
    val turns = s.read.parquet(inputDir).as[graft.model.Turn]
    turns.limit(2000).mapPartitions(_.map(t =>
      graft.extract.Extractor.extract(t.text).text.length.toLong)).reduce(_ + _)
    if (sys.env.contains("PROBE_WARM_FULL")) {
      val t = System.nanoTime()
      turns.mapPartitions(_.map(x => { graft.extract.Extractor.extract(x.text); 1L }))
        .reduce(_ + _)
      println(f"STAGEPROBE warmpass=${(System.nanoTime() - t) / 1e9}%.1fs")
    }
    val nRuns = sys.env.getOrElse("PROBE_RUNS", "1").toInt
    for (run <- 1 to nRuns) {
      val t0 = System.nanoTime()
      val stats = ExtractionPipeline.run(s, turns,
        ExtractionPipeline.Config(s"$shm/out-$run",
          nBuckets = sys.env.getOrElse("PROBE_BUCKETS", "64").toInt,
          waves = 1, resume = false))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"STAGEPROBE run=$run cores=$cores turns=${stats.turns} wall=$dt%.1fs tps=${stats.turns / dt}%.0f")
    }
    s.stop()

    // tmpfs hygiene
    def rm(d: String): Unit = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p))(
          _.sorted(java.util.Comparator.reverseOrder()).iterator().asScala.toVector)
          .foreach(f => try java.nio.file.Files.delete(f) catch { case _: Exception => () })
    }
    rm(shm)
  }
}
