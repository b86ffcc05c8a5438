package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.ExtractionPipeline
import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** Benchmark main. Prints ONE JSON line.
  *
  * Headline metric (per BASELINE.json): extraction throughput in
  * turns/sec over the synthetic transcripts table, evidenced at TWO
  * parallelism levels — `local[N/4]` and `local[N]` on identical input —
  * with per-core scaling efficiency `(thr_hi / thr_lo) / 4` (the
  * sandbox stand-in for the north rule's N vs 4N executors criterion;
  * no real cluster offline). The relational/retrieval query battery
  * times are reported alongside under "queries".
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // v2 committer: task-side renames, no serial driver-side move pass
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lowCpus = math.max(1, cpus / 4)
    // transcripts sized so the low-parallelism leg runs tens of seconds
    // (sf0.1 → ~4k convs ≈ ~40k turns incl. mega-conversations)
    // sized so the low-parallelism leg runs ≥ ~1 min — the serial fraction
    // (job scheduling, commits, manifest) must be amortized for the
    // scaling-efficiency measurement to reflect the parallel section
    val nConvs = sys.env.get("SPARK_GRAFT_BENCH_CONVS").map(_.toLong).getOrElse {
      if (sfDir.contains("sf0.1")) 60000L
      else if (sfDir.contains("sf0.01")) 5000L
      else 500L
    }

    // ---- phase 1: query battery at full parallelism ----
    var spark = session(cpus)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // ---- phase 2: extraction scaling (identical input, two sizes) ----
    val base = Files.createTempDirectory("graft-bench").toString
    val inputDir = s"$base/transcripts"
    TranscriptGen.transcripts(spark, nConvs, numPartitions = cpus * 2)
      .write.mode("overwrite").parquet(inputDir)
    spark.stop()

    /** One session per core count: a pure-compute leg (extraction only, no
      * shuffle/writes — isolates how the ENGINE scales) and two full-job
      * legs (best-of-2 against host noise). The full job shares this box's
      * single disk across both parallelism levels, so its efficiency
      * under-reads what a real cluster (4N executors = 4N disks) would
      * show; the compute leg is the disk-free scaling evidence.
      */
    def legs(cores: Int): (Long, Double, Double) = {
      val s = session(cores)
      import s.implicits._
      val turns = s.read.parquet(inputDir).as[graft.model.Turn]
      // JIT-warm the extractor paths
      turns.limit(2000).mapPartitions(_.map(t =>
        graft.extract.Extractor.extract(t.text).text.length.toLong)).reduce(_ + _)

      var n = 0L
      val computeTps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        n = turns.mapPartitions(_.map { t =>
          graft.extract.Extractor.extract(t.text); 1L
        }).reduce(_ + _)
        n / ((System.nanoTime() - t0) / 1e9)
      }.max

      // nBuckets is a DATA-size knob (output-partition granularity), not a
      // parallelism knob — identical across legs so the comparison is fair
      val fullTps = (1 to 2).map { i =>
        val t0 = System.nanoTime()
        val stats = ExtractionPipeline.run(s, turns,
          ExtractionPipeline.Config(s"$base/out-$cores-$i", nBuckets = 64,
            waves = 1, resume = false))
        stats.turns / ((System.nanoTime() - t0) / 1e9)
      }.max
      s.stop()
      (n, computeTps, fullTps)
    }

    val (nTurns, cThrLow, thrLow) = legs(lowCpus)
    val (_, cThrHigh, thrHigh) = legs(cpus)
    val factor = cpus.toDouble / lowCpus
    val efficiency = (thrHigh / thrLow) / factor
    val computeEfficiency = (cThrHigh / cThrLow) / factor

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val queriesSec = results.values.sum
    println(
      s"""{"metric":"turns_per_sec_extraction","value":${f"$thrHigh%.1f"},""" +
      s""""unit":"turns/sec","queries":$qs,"sf":"$sfDir",""" +
      s""""extraction":{"turns":$nTurns,"convs":$nConvs,""" +
      s""""cores_low":$lowCpus,"turns_per_sec_low":${f"$thrLow%.1f"},""" +
      s""""cores_high":$cpus,"turns_per_sec_high":${f"$thrHigh%.1f"},""" +
      s""""scaling_efficiency":${f"$efficiency%.3f"},""" +
      s""""compute_turns_per_sec_low":${f"$cThrLow%.1f"},""" +
      s""""compute_turns_per_sec_high":${f"$cThrHigh%.1f"},""" +
      s""""compute_scaling_efficiency":${f"$computeEfficiency%.3f"}},""" +
      s""""queries_total_sec":${f"$queriesSec%.2f"}}""")
  }
}
