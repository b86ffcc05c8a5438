package graft

import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.{Ev, Flag}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming z-score anomaly detection: single-batch equality with the
  * batch gate (q_anomaly_zscore semantics), cross-batch state
  * accumulation, and the cold-start guard.
  */
class AnomalyStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def runStream(name: String, batches: Seq[Seq[Ev]],
      minPrior: Long = 30L): Seq[Flag] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = AnomalyStream.flags(input.toDS(), minPrior = minPrior)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[Flag].collect().toSeq
    } finally q.stop()
  }

  test("single batch matches the batch query's mu+3sigma gate exactly") {
    import spark.implicits._
    // real data: sf0.001 events, quantized exactly like q_anomaly_zscore
    val evs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      .as[Ev].collect().toSeq
    val got = runStream("anom_one", Seq(evs))
      .map(f => f.event_id -> f.z).toMap
    // batch twin computed over the same rows
    val byType = evs.groupBy(_.event_type)
    val want = byType.flatMap { case (_, es) =>
      val n = es.length.toDouble
      val s1 = es.map(_.v).sum
      val s2 = es.map(e => e.v * e.v).sum
      val mu = s1.toDouble / n
      val sigma = math.sqrt((s2.toDouble - s1.toDouble * s1.toDouble / n) / n)
      es.filter(e => e.v.toDouble > mu + 3.0 * sigma)
        .map(e => e.event_id -> (e.v.toDouble - mu) / sigma)
    }
    assert(got == want)
    assert(got.nonEmpty) // the fixture genuinely exercises the gate
  }

  test("moments accumulate across batches; cold types stay quiet") {
    // batch 1: 30 calm values (mean 100) — enough history, no outlier;
    // plus a cold type with huge values but < minPrior events
    val calm = (1L to 30L).map(i => Ev(i, "t", 100L + (i % 3)))
    val cold = (1L to 5L).map(i => Ev(1000 + i, "cold", 999999L))
    // batch 2: one spike on the warm type
    val spike = Seq(Ev(99L, "t", 100000L))
    val flags = runStream("anom_two", Seq(calm ++ cold, spike), minPrior = 30L)
    // only the warm-type spike fires; its n_seen covers both batches
    assert(flags.map(_.event_id) == Seq(99L))
    assert(flags.head.n_seen == 31L)
    assert(flags.head.z > 3.0)
  }

  test("zero variance never divides by zero") {
    val const = (1L to 40L).map(i => Ev(i, "c", 7L))
    assert(runStream("anom_const", Seq(const)).isEmpty)
  }
}
