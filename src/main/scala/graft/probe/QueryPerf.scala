package graft.probe

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch main: time selected battery queries at local[32] under the
  * same session config as [[graft.Bench]]'s query phase, for iterating on
  * a single query without paying the full bench's extraction legs.
  *
  *   runMain graft.probe.QueryPerf /root/testdata/sf0.1 q_hybrid_funnel ...
  */
object QueryPerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_hybrid_funnel")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/documents.parquet").limit(100).count()
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskTime = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskTime.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    for (rep <- 1 to 2; name <- names) {
      val fn = SparkEntry.queries(name)
      stages.set(0); taskTime.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener bus drain
      println(f"[queryperf] rep$rep $name rows=$n $wall%.2fs " +
        f"stages=${stages.get()} taskSec=${taskTime.get() / 1e3}%.1f")
    }
    spark.stop()
  }
}
