package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of join operator (logical node → strategy → sorted-merge
  * exec): exact backward-as-of semantics vs a driver-side brute force,
  * parity with the composed built-in form, NULL-key/time behavior, ties,
  * self-join resolution, empty sides, string keys, and the plan shape
  * (the custom node planned, no nested-loop/cartesian anywhere).
  */
final case class TypedP(user: Long, ts: Long, pid: Long)
final case class TypedV(user: Long, ts: Long, vid: Long)

class AsofJoinExecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val lSchema = StructType(Seq(
    StructField("uid", LongType, nullable = true),
    StructField("lts", LongType, nullable = true),
    StructField("pid", LongType, nullable = false)))
  private val rSchema = StructType(Seq(
    StructField("v_uid", LongType, nullable = true),
    StructField("v_ts", LongType, nullable = true),
    StructField("vid", LongType, nullable = false)))

  private def df(schema: StructType, rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)

  /** Deterministic pseudo-random fixture: ~30 users, out-of-order event
    * ids, some users view-less, some purchase-before-any-view, plus NULL
    * keys and NULL times on both sides.
    */
  private def fixture: (DataFrame, DataFrame) = {
    def mix(i: Long): Long = { // xorshift-ish, deterministic
      var x = i * 0x9E3779B97F4A7C15L + 1; x ^= x >>> 33; x & 0x7fffffff
    }
    val views = (0L until 400L).map { i =>
      val uid = mix(i) % 30
      Row(if (i % 37 == 0) null else java.lang.Long.valueOf(uid),
        if (i % 41 == 0) null else java.lang.Long.valueOf(mix(i * 3) % 1000),
        java.lang.Long.valueOf(i))
    }
    val purchases = (0L until 150L).map { i =>
      val uid = mix(i + 7000) % 33 // 30..32 purchase with no views at all
      Row(if (i % 29 == 0) null else java.lang.Long.valueOf(uid),
        if (i % 31 == 0) null else java.lang.Long.valueOf(mix(i * 5 + 13) % 1000),
        java.lang.Long.valueOf(i))
    }
    // unique right (key, time): keep one view per (uid, ts) — max id — so
    // tie resolution can't make the brute-force expectation ambiguous
    val v = df(rSchema, views).groupBy("v_uid", "v_ts")
      .agg(max("vid").as("vid"))
    (df(lSchema, purchases), v)
  }

  private def bruteForce(left: Seq[Row], right: Seq[Row]): Set[(Long, Option[Long])] =
    left.map { l =>
      val matched =
        if (l.isNullAt(0) || l.isNullAt(1)) None
        else right.filter(r => !r.isNullAt(0) && !r.isNullAt(1) &&
            r.getLong(0) == l.getLong(0) && r.getLong(1) <= l.getLong(1))
          .sortBy(r => (r.getLong(1), r.getLong(2))).lastOption
      (l.getLong(2), matched.map(_.getLong(2)))
    }.toSet

  test("exact backward as-of semantics vs brute force, incl. NULLs") {
    val (p, v) = fixture
    val out = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    val expected = bruteForce(p.collect(), v.collect())
    assert(out.size == p.count())
    assert(out == expected)
  }

  test("parity with the composed union+window as-of form") {
    val (p, v) = fixture
    val exec = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
      .select("pid", "vid")
    // composed form (the q_asof_join shape): tag, union, running last()
    val lTagged = p.select(col("uid").as("k"), col("lts").as("t"),
      lit(1).as("side"), col("pid"), lit(null).cast("long").as("vid"))
    val rTagged = v.select(col("v_uid").as("k"), col("v_ts").as("t"),
      lit(0).as("side"), lit(null).cast("long").as("pid"), col("vid"))
    val w = Window.partitionBy("k").orderBy(col("t"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = lTagged.unionByName(rTagged)
      .filter(col("k").isNotNull && col("t").isNotNull)
      .withColumn("m", last("vid", ignoreNulls = true).over(w))
      .filter(col("side") === 1).select(col("pid"), col("m").as("vid"))
      // null-key/time left rows drop out of the window form; restore them
      .unionByName(p.filter(col("uid").isNull || col("lts").isNull)
        .select(col("pid"), lit(null).cast("long").as("vid")))
    def norm(d: DataFrame) = d.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(norm(exec) == norm(composed))
  }

  test("equal timestamps match inclusively; later views never match") {
    val p = df(lSchema, Seq(Row(1L: java.lang.Long, 100L: java.lang.Long, 1L: java.lang.Long)))
    val v = df(rSchema, Seq(
      Row(1L: java.lang.Long, 100L: java.lang.Long, 10L: java.lang.Long),
      Row(1L: java.lang.Long, 101L: java.lang.Long, 11L: java.lang.Long)))
    val out = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
      .select("pid", "vid").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L)))
  }

  test("empty right side yields all-NULL right columns") {
    val (p, _) = fixture
    val v = df(rSchema, Seq.empty)
    val out = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
    assert(out.count() == p.count())
    assert(out.filter(col("vid").isNotNull).count() == 0)
  }

  test("self-join: both sides carved from one scan resolve and run") {
    import spark.implicits._
    val ev = (0 until 200).map(i =>
      (i.toLong, (i % 11).toLong, ((i * 17) % 300).toLong,
        if (i % 3 == 0) "purchase" else "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("vu"), col("ts").as("vts"))
      .agg(max("event_id").as("vid"))
    val out = AsofJoin.asof(p, v, Seq("user_id"), Seq("vu"), "ts", "vts")
    assert(out.count() == p.count())
    // spot-invariant: every matched view is a real prior-or-equal view
    val vv = v.toDF("vu2", "vts2", "vid2")
    val bad = out.filter(col("vid").isNotNull)
      .join(vv, col("vid") === col("vid2"))
      .filter(col("vts2") > col("ts") || col("vu2") =!= col("user_id"))
    assert(bad.count() == 0)
  }

  test("tolerance: stale matches NULL out, never remap to an older row") {
    val p = df(lSchema, Seq(
      Row(1L: java.lang.Long, 100L: java.lang.Long, 1L: java.lang.Long),
      Row(1L: java.lang.Long, 200L: java.lang.Long, 2L: java.lang.Long),
      Row(2L: java.lang.Long, 100L: java.lang.Long, 3L: java.lang.Long)))
    val v = df(rSchema, Seq(
      Row(1L: java.lang.Long, 95L: java.lang.Long, 10L: java.lang.Long),
      Row(1L: java.lang.Long, 60L: java.lang.Long, 11L: java.lang.Long),
      Row(2L: java.lang.Long, 10L: java.lang.Long, 12L: java.lang.Long)))
    for (bcast <- Seq(false, true)) {
      val out = AsofJoin.asofWithin(p, v, Seq("uid"), Seq("v_uid"),
          "lts", "v_ts", tolerance = lit(20L), broadcastRight = bcast)
        .select("pid", "vid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      // pid=1: latest view ts=95 within [80,100] → 10. pid=2: latest view
      // ts=95 but window is [180,200] → NULL (NOT the older 60). pid=3:
      // latest view ts=10, window [80,100] → NULL.
      assert(out == Set((1L, Some(10L)), (2L, None), (3L, None)),
        s"bcast=$bcast: $out")
    }
  }

  test("string keys work (ordering is type-generic)") {
    val ls = StructType(Seq(StructField("k", StringType, true),
      StructField("lts", LongType, true), StructField("pid", LongType, false)))
    val rs = StructType(Seq(StructField("rk", StringType, true),
      StructField("v_ts", LongType, true), StructField("vid", LongType, false)))
    val p = df(ls, Seq(Row("alpha", 10L: java.lang.Long, 1L: java.lang.Long),
      Row("beta", 10L: java.lang.Long, 2L: java.lang.Long),
      Row("gamma", 10L: java.lang.Long, 3L: java.lang.Long)))
    val v = df(rs, Seq(Row("alpha", 5L: java.lang.Long, 10L: java.lang.Long),
      Row("beta", 11L: java.lang.Long, 20L: java.lang.Long)))
    val out = AsofJoin.asof(p, v, Seq("k"), Seq("rk"), "lts", "v_ts")
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(out == Set((1L, Some(10L)), (2L, None), (3L, None)))
  }

  test("validation: mismatched key/time types and shared names are rejected") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("uid", "lts", "pid")
    val rIntKey = Seq((1, 50L, 10L)).toDF("v_uid", "v_ts", "vid") // INT key
    val e1 = intercept[IllegalArgumentException](
      AsofJoin.asof(l, rIntKey, Seq("uid"), Seq("v_uid"), "lts", "v_ts"))
    assert(e1.getMessage.contains("mismatched"), e1.getMessage)
    val rIntTime = Seq((1L, 50, 10L)).toDF("v_uid", "v_ts", "vid") // INT time
    val e2 = intercept[IllegalArgumentException](
      AsofJoin.asof(l, rIntTime, Seq("uid"), Seq("v_uid"), "lts", "v_ts"))
    assert(e2.getMessage.contains("mismatched"), e2.getMessage)
    val rShared = Seq((1L, 50L, 10L)).toDF("v_uid", "v_ts", "pid") // name clash
    val e3 = intercept[IllegalArgumentException](
      AsofJoin.asof(l, rShared, Seq("uid"), Seq("v_uid"), "lts", "v_ts"))
    assert(e3.getMessage.contains("pid"), e3.getMessage)
  }

  test("validation: column resolution honors session case-insensitivity") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("UID", "LTS", "pid")
    val r = Seq((1L, 50L, 10L)).toDF("v_uid", "v_ts", "vid")
    // default spark.sql.caseSensitive=false: 'uid'/'lts' must resolve
    val out = AsofJoin.asof(l, r, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
      .select("pid", "vid").collect()
    assert(out.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 10L)))
  }

  test("SQL metrics: output and matched row counts reported by both execs") {
    // AQE query stages hide their subtree from plan.collect — run this
    // one query non-adaptively so the exec node is directly reachable
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (p, v) = fixture
      val nL = p.count()
      for (bcast <- Seq(false, true)) {
        val out = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts",
          broadcastRight = bcast)
        val nMatched = out.filter(col("vid").isNotNull).count()
        out.collect()
        val exec = out.queryExecution.executedPlan.collectFirst {
          case e if e.nodeName.startsWith("AsofJoin") => e }.get
        assert(exec.metrics("numOutputRows").value == nL,
          s"bcast=$bcast: ${exec.metrics("numOutputRows").value}")
        assert(exec.metrics("numMatched").value == nMatched,
          s"bcast=$bcast: ${exec.metrics("numMatched").value} != $nMatched")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("typed as-of: Dataset[(L, Option[R])], shared field names welcome") {
    import spark.implicits._
    // L and R deliberately share BOTH field names — the untyped API's
    // disjoint-name rule is handled internally
    val p = Seq(TypedP(1L, 100L, 10L), TypedP(1L, 40L, 11L), TypedP(2L, 50L, 12L))
      .toDS()
    val v = Seq(TypedV(1L, 90L, 900L), TypedV(1L, 10L, 901L)).toDS()
    for (bcast <- Seq(false, true)) {
      val out = AsofJoin.asofTyped(p, v, Seq("user"), Seq("user"), "ts", "ts",
          broadcastRight = bcast)
        .collect().map { case (l, r) => (l.pid, r.map(_.vid)) }.toSet
      assert(out == Set((10L, Some(900L)), (11L, Some(901L)), (12L, None)),
        s"bcast=$bcast: $out")
    }
  }

  test("stats: output sized like the left side, so it can broadcast downstream") {
    import spark.implicits._
    val (p, v) = fixture
    val enriched = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
    // node-level: linear in the left side, not the children's product
    val node = enriched.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsofJoinPlan => a }.head
    val product = node.left.stats.sizeInBytes * node.right.stats.sizeInBytes
    assert(node.stats.sizeInBytes < product,
      s"as-of stats ${node.stats.sizeInBytes} not below product $product")
    // behavioral: joined to a big fact table, the small ENRICHED side must
    // be the broadcast side — with product stats it would be sized in the
    // tens of GB and the plan degrades to a sort-merge join
    val fact = spark.range(3000000L).select(col("id").as("pid2"),
      (col("id") % 97).as("payload"))
    val joined = fact.join(enriched, col("pid2") === col("pid"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      joined.queryExecution.executedPlan.toString.take(2000))
  }

  test("plan: custom exec planned, co-partitioned, no nested loop") {
    val (p, v) = fixture
    val out = AsofJoin.asof(p, v, Seq("uid"), Seq("v_uid"), "lts", "v_ts")
    out.collect() // finalize any adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // EnsureRequirements materialized the merge's layout: key shuffles
    // and (keys, time) sorts on both children
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"), plan)
  }
}
