package graft

import graft.plans.AsofJoin
import graft.streaming.{AsofStream, Sessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Stream-stream as-of enrichment: out-of-order views still match the
  * purchases they precede (finalization waits for the watermark), state
  * stays bounded, and a randomized run is row-equal to the batch
  * [[AsofJoin]] operator over the same events.
  */
class AsofStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ev(id: Long, tsSec: Long, uid: Long, kind: String) =
    Sessionize.Event(id, new Timestamp(tsSec * 1000), uid, kind, 0.0)

  private def run(waves: Seq[Seq[Sessionize.Event]]): Set[(Long, Option[Long])] = {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Sessionize.Event]
    val q = AsofStream.enrich(input.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("asof_stream_enriched")
      .outputMode("append").start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()
    spark.table("asof_stream_enriched")
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
  }

  test("late view within the watermark still matches; no-view purchase emits NULL") {
    val got = run(Seq(
      // wave 1: purchases buffered (watermark still at 0)
      Seq(ev(10, 150, 1, "view"), ev(1, 100, 1, "purchase"),
        ev(2, 200, 1, "purchase"), ev(3, 100, 2, "purchase")),
      // wave 2: a LATE view (t=90 < everything already seen) arrives while
      // the watermark is still 0 — it must win purchase 1; the far event
      // advances the watermark so timeouts can flush
      Seq(ev(11, 90, 1, "view"), ev(90, 900, 99, "view")),
      // wave 3: another advance so the no-data timeout batch runs
      Seq(ev(91, 1000, 99, "view"))))
    assert(got == Set((1L, Some(11L)), (2L, Some(10L)), (3L, None)))
  }

  test("checkpoint restart: buffered purchases survive and emit exactly once") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("asof-ckpt").toString
    val input = MemoryStream[Sessionize.Event]
    def start() = AsofStream.enrich(
        input.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()

    // run 1: purchase + view buffered, watermark still 0 → nothing emits
    input.addData(Seq(ev(1, 100, 1, "purchase"), ev(10, 150, 1, "view")))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // run 2 from the same checkpoint: the state must still hold the
    // buffered purchase; a LATE view (t=90) arrives and must win it, and
    // the advancers flush via watermark + timeout
    input.addData(Seq(ev(11, 90, 1, "view"), ev(90, 900, 99, "view")))
    val q2 = start()
    q2.processAllAvailable()
    input.addData(Seq(ev(91, 1000, 99, "view")))
    q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(s"$base/out")
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.length == 1, s"expected exactly one emission, got ${out.toSeq}")
    assert(out.head == ((1L, Some(11L))))
  }

  test("randomized parity with the batch as-of operator") {
    import spark.implicits._
    val rnd = new scala.util.Random(2718)
    val events = (0L until 300L).map { i =>
      val kind = if (rnd.nextInt(3) == 0) "purchase" else "view"
      ev(i, rnd.nextInt(500).toLong, rnd.nextInt(12).toLong, kind)
    }
    // three arbitrary waves, then a sentinel that pushes the watermark far
    // past every real event (sentinel user 999 has no purchases)
    val waves = events.grouped(100).toSeq :+ Seq(ev(9999, 1000000, 999, "view"))
    val got = run(waves)

    val df = events.toDF()
    val purchases = df.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val views = df.filter(col("event_type") =!= "purchase")
      .groupBy(col("user_id").as("vu"), col("ts").as("vts"))
      .agg(max("event_id").as("vid"))
    val batch = AsofJoin.asof(purchases, views, Seq("user_id"), Seq("vu"), "ts", "vts")
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got == batch,
      s"stream-only: ${(got -- batch).take(5)}; batch-only: ${(batch -- got).take(5)}")
  }
}
