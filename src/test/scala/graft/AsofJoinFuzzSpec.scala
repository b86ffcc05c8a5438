package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the custom sorted-merge as-of operator: many random
  * corpora (skewed key cardinality, heavy duplicate timestamps, NULL keys
  * and times, empty sides, composite keys) each checked row-exactly
  * against a driver-side brute force, across shuffle-partition settings —
  * the merge must be partition-count-invariant or it isn't a correct
  * distributed operator.
  */
class AsofJoinFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private final class Rng(var x: Long) { // splitmix64 — deterministic
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E9B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)) & Long.MaxValue
    }
    def nextInt(n: Int): Int = (next() % n).toInt
  }

  private val lSchema = StructType(Seq(
    StructField("k1", LongType, nullable = true),
    StructField("k2", StringType, nullable = true),
    StructField("t", LongType, nullable = true),
    StructField("lid", LongType, nullable = false)))
  private val rSchema = StructType(Seq(
    StructField("rk1", LongType, nullable = true),
    StructField("rk2", StringType, nullable = true),
    StructField("rt", LongType, nullable = true),
    StructField("rid", LongType, nullable = false)))

  private def df(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  /** Random side: nKeys distinct (k1, k2) pairs, times drawn from a SMALL
    * range so duplicate timestamps are common, ~8% NULL keys/times.
    */
  private def side(rng: Rng, n: Int, nKeys: Int, tRange: Int,
                   idBase: Long): Seq[Row] =
    (0 until n).map { i =>
      val k = rng.nextInt(nKeys)
      Row(
        if (rng.nextInt(12) == 0) null else java.lang.Long.valueOf(k.toLong),
        if (rng.nextInt(12) == 0) null else s"g${k % 3}",
        if (rng.nextInt(12) == 0) null
        else java.lang.Long.valueOf(rng.nextInt(tRange).toLong),
        java.lang.Long.valueOf(idBase + i))
    }

  /** Brute-force as-of on (k1, k2): latest rt <= t (backward), earliest
    * rt >= t (forward), or the closer of the two with ties backward
    * (nearest); right rows pre-deduped to unique (key, time) by max rid
    * so expectations are unambiguous.
    */
  private def brute(left: Seq[Row], right: Seq[Row],
      direction: String): Map[Long, Option[Long]] = {
    val uniq = right
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
      .groupBy(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map { case (_, rs) => rs.maxBy(_.getLong(3)) }.toSeq
    left.map { l =>
      val m =
        if (l.isNullAt(0) || l.isNullAt(1) || l.isNullAt(2)) None
        else {
          val t = l.getLong(2)
          val keyed = uniq.filter(r => r.getLong(0) == l.getLong(0) &&
            r.getString(1) == l.getString(1))
          def prev = keyed.filter(_.getLong(2) <= t)
            .sortBy(r => (r.getLong(2), r.getLong(3))).lastOption
          def next = keyed.filter(_.getLong(2) >= t)
            .sortBy(r => (r.getLong(2), -r.getLong(3))).headOption
          direction match {
            case "forward" => next
            case "backward" => prev
            case "nearest" => (prev, next) match {
              case (None, n) => n
              case (p, None) => p
              case (Some(p), Some(n)) =>
                if (t - p.getLong(2) <= n.getLong(2) - t) Some(p) else Some(n)
            }
          }
        }
      l.getLong(3) -> m.map(_.getLong(3))
    }.toMap
  }

  test("random corpora: exec == brute force, composite keys, any partitioning") {
    val rng = new Rng(0xA5F0C3L)
    for (trial <- 0 until 12) {
      val nL = 1 + rng.nextInt(180)
      val nR = rng.nextInt(220) // can be 0: empty right side
      val nKeys = 1 + rng.nextInt(12)
      val tRange = 1 + rng.nextInt(25) // tiny → many exact-tie timestamps
      val parts = 1 + rng.nextInt(7)
      val lRows = side(rng, nL, nKeys, tRange, 0)
      val rRows = side(rng, nR, nKeys, tRange, 100000)
      val r = df(rSchema, rRows)
        .filter(col("rk1").isNotNull && col("rk2").isNotNull && col("rt").isNotNull)
        .groupBy("rk1", "rk2", "rt").agg(max("rid").as("rid"))
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        // every trial runs all direction × physical-form combinations,
        // plus the time-sliced skew path with a random slice width
        for (d <- Seq("backward", "forward", "nearest")) {
          val expected = brute(lRows, rRows, d)
          val width = (1 + rng.nextInt(2 * tRange)).toDouble
          val variants = Seq(
            s"merge" -> AsofJoin.asof(df(lSchema, lRows), r,
              Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt", direction = d),
            s"bcast" -> AsofJoin.asof(df(lSchema, lRows), r,
              Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt",
              broadcastRight = true, direction = d),
            s"sliced(w=$width)" -> AsofJoin.asofTimeSliced(df(lSchema, lRows), r,
              Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt",
              sliceWidth = width, direction = d))
          for ((form, frame) <- variants) {
            val out = frame.select("lid", "rid").collect()
              .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
              .toMap
            assert(out.size == nL,
              s"trial $trial $form dir=$d: row count ${out.size} != $nL")
            assert(out == expected,
              s"trial $trial $form dir=$d (nL=$nL nR=$nR keys=$nKeys tRange=$tRange parts=$parts): " +
                s"${(out.toSet -- expected.toSet).take(5)} vs ${(expected.toSet -- out.toSet).take(5)}")
          }
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
