package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-routed as-of: a mega-key must route through the broadcast form
  * (left rows never gathered into one task) while every other key takes
  * the normal merge, with the union row-identical to the plain operator.
  */
class AsofJoinSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Key 7 holds ~80% of the left rows; keys 0..6 are tiny. */
  private def fixture = {
    import spark.implicits._
    val left = ((0L until 4000L).map(i => (7L, (i % 600) + 1, i)) ++
        (0L until 700L).map(i => (i % 7, (i % 40) * 3, 100000 + i)))
      .toDF("uid", "lts", "pid")
    val right = ((0L until 300L).map(i => (7L, i * 2, 5000 + i)) ++
        (0L until 200L).map(i => (i % 7, i, 9000 + i)))
      .toDF("v_uid", "v_ts", "vid")
      .groupBy("v_uid", "v_ts").agg(max("vid").as("vid"))
    (left, right)
  }

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "vid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet

  test("routed result equals the plain merge operator, all directions") {
    val (l, r) = fixture
    for (d <- Seq("backward", "forward", "nearest")) {
      val routed = AsofJoin.asofSkewRouted(l, r, Seq("uid"), Seq("v_uid"),
        "lts", "v_ts", hotThreshold = 1000, direction = d)
      val plain = AsofJoin.asof(l, r, Seq("uid"), Seq("v_uid"),
        "lts", "v_ts", direction = d)
      assert(routed.count() == l.count())
      assert(norm(routed) == norm(plain), s"direction=$d")
    }
  }

  test("plan: hot leg broadcasts, cold leg merges, union on top") {
    val (l, r) = fixture
    val routed = AsofJoin.asofSkewRouted(l, r, Seq("uid"), Seq("v_uid"),
      "lts", "v_ts", hotThreshold = 1000)
    routed.collect()
    val p = routed.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoinBroadcast"), p.take(3000))
    // the merge form appears for the cold leg (named AsofJoin, not the
    // broadcast variant) — check for its exec line specifically
    assert(p.linesIterator.exists(line =>
        line.contains("AsofJoin ") || line.contains("AsofJoinExec")),
      p.take(3000))
    assert(p.contains("Union"), p.take(3000))
    // the hot-key split itself must ride broadcasts, not shuffles
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("time-sliced: hot-on-BOTH-sides key equals the plain operator") {
    import spark.implicits._
    // key 7: 3000 left rows AND 2500 right rows (too big to broadcast in
    // spirit); times overlap so carry-ins matter — many left rows sit in
    // buckets whose matching view is from an earlier bucket
    val left = ((0L until 3000L).map(i => (7L, i * 3 + 1, i)) ++
        (0L until 200L).map(i => (i % 7, i * 11, 100000 + i)))
      .toDF("uid", "lts", "pid")
    val right = ((0L until 2500L).map(i => (7L, i * 7, 5000 + i)) ++
        (0L until 150L).map(i => (i % 7, i * 5, 9000 + i)))
      .toDF("v_uid", "v_ts", "vid")
      .groupBy("v_uid", "v_ts").agg(max("vid").as("vid"))
    for (d <- Seq("backward", "forward", "nearest")) {
      val s = AsofJoin.asofTimeSliced(left, right, Seq("uid"), Seq("v_uid"),
        "lts", "v_ts", sliceWidth = 500.0, direction = d)
      val pl = AsofJoin.asof(left, right, Seq("uid"), Seq("v_uid"),
        "lts", "v_ts", direction = d)
      assert(s.count() == left.count(), s"direction=$d")
      assert(norm(s) == norm(pl), s"direction=$d")
    }
    val sliced = AsofJoin.asofTimeSliced(left, right, Seq("uid"), Seq("v_uid"),
      "lts", "v_ts", sliceWidth = 500.0)
    // the merge must shuffle on the EXTENDED (key, bucket) key so the
    // mega-key spreads across partitions
    sliced.collect()
    val p = sliced.queryExecution.executedPlan.toString
    assert(p.contains("__asof_bucket"), p.take(3000))
    val extKey = """hashpartitioning\(uid#\d+L?, __asof_bucket""".r
    assert(extKey.findFirstIn(p).isDefined,
      s"merge not keyed on (key, bucket):\n${p.take(3000)}")
  }

  test("time-sliced: sparse right side carries across many empty buckets") {
    import spark.implicits._
    // one view at t=10, purchases spread to t=100000: every later bucket's
    // match rides a carry-in chain across hundreds of empty buckets
    val left = (0L until 50L).map(i => (1L, i * 2000 + 11, i))
      .toDF("uid", "lts", "pid")
    val right = Seq((1L, 10L, 99L), (2L, 5L, 98L))
      .toDF("v_uid", "v_ts", "vid")
    val out = AsofJoin.asofTimeSliced(left, right, Seq("uid"), Seq("v_uid"),
      "lts", "v_ts", sliceWidth = 100.0)
    val got = norm(out)
    assert(got == (0L until 50L).map(i => i -> Some(99L)).toSet)
  }

  test("no hot keys: routed degenerates to the merge answer") {
    val (l, r) = fixture
    val routed = AsofJoin.asofSkewRouted(l, r, Seq("uid"), Seq("v_uid"),
      "lts", "v_ts", hotThreshold = 1000000)
    val plain = AsofJoin.asof(l, r, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
    assert(norm(routed) == norm(plain))
  }
}
