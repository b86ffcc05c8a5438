package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, TableIO}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The north rule's resumability clause, tested LITERALLY: a separate
  * JVM running the extraction job is SIGKILLed mid-run (torn bucket
  * dirs, no shutdown hooks, nothing flushed), and the re-run must
  * resume from the per-partition manifest with ZERO reprocessing of
  * committed buckets and a complete, duplicate-free final table.
  * `ExtractionPipelineSpec` covers the simulated variants (manifest
  * rewind, orphan dirs); this is the real-crash end-to-end proof the
  * BASELINE target table promises.
  */
class KillResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SIGKILL mid-job, then resume: zero reprocessing, exact output") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_kill_in").toString
    val out = Files.createTempDirectory("graft_kill_out").toString + "/table"
    // big enough that a local[2] job spends ~20s across 8 waves — a wide
    // kill window; the spec aborts (rather than flakes) if the job wins
    val turns = TranscriptGen.transcripts(spark, nConvs = 12000, numPartitions = 8)
    turns.write.mode("overwrite").parquet(in)
    val totalTurns = spark.read.parquet(in).count()

    // fork the job with the library + Spark on the classpath (the spec
    // must not depend on sbt's own classpath layout)
    val cp = "target/scala-2.13/classes:/opt/spark/jars/*"
    // the module opens Spark's own launcher injects (JavaModuleOptions)
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/jdk.internal.ref", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar").map(m => s"--add-opens=$m=ALL-UNNAMED")
    val pb = new ProcessBuilder(
      (Seq("java", "-Xmx3g", "-cp", cp) ++ opens ++
        Seq("graft.probe.KillableJob", in, out)): _*)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()

    // poll the manifest; SIGKILL once some — but not all — buckets are
    // durably committed
    val deadline = System.nanoTime() + 180L * 1000000000L
    var committed = 0
    while (p.isAlive && committed < 2 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      committed = TableIO.read(out).completed.size
    }
    assert(committed >= 2, s"job never committed a wave (alive=${p.isAlive})")
    assert(p.isAlive && committed < 16,
      s"job finished before the kill (committed=$committed) — grow nConvs")
    p.destroyForcibly()
    p.waitFor()

    val pre = TableIO.read(out)
    assert(pre.completed.nonEmpty && pre.completed.size < 16)
    val preRows = pre.completed.values.map(_.rows).sum

    // resume in-process with the IDENTICAL config
    val resumed = ExtractionPipeline.run(spark,
      spark.read.parquet(in).as[graft.model.Turn],
      ExtractionPipeline.Config(out, nBuckets = 16, waves = 8, resume = true))

    // zero reprocessing: every pre-kill bucket skipped, only the rest ran
    assert(resumed.skippedBuckets == pre.completed.size,
      s"expected ${pre.completed.size} skipped, got ${resumed.skippedBuckets}")
    assert(resumed.turns == totalTurns - preRows,
      "resume must process exactly the un-committed remainder")

    // committed buckets were not rewritten: their manifest entries are
    // byte-identical (same rows, same writer snapshot stamp)
    val post = TableIO.read(out)
    pre.completed.foreach { case (b, e) =>
      assert(post.completed(b) == e, s"bucket $b entry changed across resume")
    }

    // the final table is complete and duplicate-free
    val got = spark.read.parquet(ExtractionPipeline.extractedDir(out))
      .select("conv_id", "turn_idx")
    assert(got.count() == totalTurns)
    assert(got.distinct().count() == totalTurns)
  }
}
