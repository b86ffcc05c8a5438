package graft.probe

import graft.retrieval.VectorIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B (not part of the driver contract): Lloyd-round cost of
  * the round-4 `graft_vec_sum` aggregate vs the relational posexplode →
  * per-dimension avg it replaced, on the sf embeddings table.
  * Usage: runMain graft.probe.CentroidPerf [sfDir] [k] [reps]
  */
object CentroidPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("centroid-perf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 4th arg: synthesize N deterministic 64-dim vectors instead of the
    // (small) sf embeddings table, to show the shuffle asymptotics
    val e = args.lift(3).map(_.toLong) match {
      case Some(n) =>
        spark.range(n).toDF("id")
          .select(col("id").cast("string").as("chunk_id"),
            expr("transform(sequence(1, 64), j -> " +
              "cast(pmod(hash(id * 64 + j), 1000) as double) / 1000.0)")
              .as("embedding"))
          .repartition(64)
          .localCheckpoint(true)
      case None =>
        spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").cast("string").as("chunk_id"), col("embedding"))
          .localCheckpoint(true)
    }
    println(s"rows=${e.count()} dim=" +
      e.select(size(col("embedding"))).head().getInt(0))
    val seeds = VectorIndex.trainCentroids(e, k, iters = 0)
    // shuffle-byte meter: the resource a 1000-executor cluster pays
    // network for — the structural point of the aggregate rewrite
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(ev.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def time[T](f: => T): (Double, Long) = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let the listener bus drain
      (dt, shuffleBytes.get())
    }
    (1 to reps).foreach { r =>
      val (agg, aggB) = time(VectorIndex.trainCentroids(e, k, iters = 1))
      val (rel, relB) = time(VectorIndex.lloydRoundRelational(e, seeds))
      println(f"rep$r agg_round=$agg%.2fs (${aggB / 1024}%d KiB shuffled) " +
        f"relational_round=$rel%.2fs (${relB / 1024}%d KiB shuffled)")
    }
    spark.stop()
  }
}
