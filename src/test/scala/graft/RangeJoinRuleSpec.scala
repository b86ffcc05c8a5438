package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The expand-to-equi optimizer rule: a naive `abs(a-b) <= k` inner join
  * must plan as an equi-join (no BroadcastNestedLoopJoin), return exactly
  * the rows the predicate defines, keep extra conjuncts, and leave
  * non-qualifying plans (k too large) untouched.
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    RangeJoinRule.install(s)
    s
  }

  private def chunks: DataFrame = {
    import spark.implicits._
    (0 until 120).map(i => (s"c$i", i % 23)).toDF("chunk_id", "page")
  }
  private def images: DataFrame = {
    import spark.implicits._
    (0 until 60).map(i => (s"img$i", (i * 7) % 23)).toDF("img_id", "ipage")
  }

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def expectedPairs(k: Int): Set[(String, String)] = {
    val cs = chunks.collect().map(r => (r.getString(0), r.getInt(1)))
    val is = images.collect().map(r => (r.getString(0), r.getInt(1)))
    (for {
      (c, p) <- cs
      (im, ip) <- is
      if math.abs(p - ip) <= k
    } yield (c, im)).toSet
  }

  test("abs-range join plans as an equi-join with exactly the right rows") {
    import spark.implicits._
    val joined = chunks.join(images, abs(col("page") - col("ipage")) <= 1)
      .select("chunk_id", "img_id")
    val plan = planOf(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not nested-loop:\n$plan")
    assert(plan.contains("Generate explode"),
      s"rewrite must expand probes via explode:\n$plan")
    assert(joined.as[(String, String)].collect().toSet == expectedPairs(1))
  }

  test("reversed operand order and k >= abs(...) form also rewrite") {
    import spark.implicits._
    val joined = images.join(chunks, lit(2) >= abs(col("page") - col("ipage")))
      .select("chunk_id", "img_id")
    val plan = planOf(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(joined.as[(String, String)].collect().toSet == expectedPairs(2))
  }

  test("extra conjuncts survive the rewrite") {
    import spark.implicits._
    val joined = chunks.join(images,
      abs(col("page") - col("ipage")) <= 1 && col("page") % 2 === 0)
      .select("chunk_id", "img_id")
    val plan = planOf(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val expected = {
      val cs = chunks.collect().map(r => (r.getString(0), r.getInt(1)))
      val is = images.collect().map(r => (r.getString(0), r.getInt(1)))
      (for {
        (c, p) <- cs; (im, ip) <- is
        if math.abs(p - ip) <= 1 && p % 2 == 0
      } yield (c, im)).toSet
    }
    assert(joined.as[(String, String)].collect().toSet == expected)
  }

  test("fuzz: rewrite equals the naive predicate on random tables incl. negatives") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    for (round <- 0 until 8) {
      val k = Seq(0, 1, 2, 5, 15)(rng.nextInt(5))
      val left = (0 until 40).map(i => (i, rng.nextInt(41) - 20)).toDF("lid", "x")
      val right = (0 until 40).map(i => (i, rng.nextInt(41) - 20)).toDF("rid", "y")
      val got = left.join(right, abs(col("x") - col("y")) <= k)
        .select("lid", "rid").as[(Int, Int)].collect().toSet
      val want = (for {
        (l, x) <- left.collect().map(r => (r.getInt(0), r.getInt(1)))
        (r, y) <- right.collect().map(r0 => (r0.getInt(0), r0.getInt(1)))
        if math.abs(x - y) <= k
      } yield (l, r)).toSet
      assert(got == want, s"round=$round k=$k")
    }
  }

  test("Long operands and overflow-scale k both refuse the rewrite") {
    import spark.implicits._
    // Long keys near the extremes would wrap under x ± k — no rewrite
    val ll = Seq((1L, Long.MaxValue), (2L, Long.MaxValue - 1)).toDF("lid", "x")
    val rr = Seq((3L, Long.MaxValue - 1)).toDF("rid", "y")
    val longJoin = ll.join(rr, abs(col("x") - col("y")) <= 1)
    assert(planOf(longJoin).contains("BroadcastNestedLoopJoin"),
      "Long operands must not rewrite")
    assert(longJoin.count() == 2, "naive plan still answers correctly")

    // a k large enough that 2k+1 overflows Long must trip the guard,
    // not slip past it into an astronomically long Sequence
    val hugeK = ll.join(rr, abs(col("x") - col("y")) <= lit(Long.MaxValue / 2))
    assert(planOf(hugeK).contains("BroadcastNestedLoopJoin"),
      "overflow-scale k must not rewrite")
  }

  test("k beyond maxExpand leaves the nested-loop plan untouched") {
    spark.conf.set(RangeJoinRule.MaxExpandKey, "5")
    try {
      val joined = chunks.join(images, abs(col("page") - col("ipage")) <= 10)
      val plan = planOf(joined)
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"k=10 exceeds maxExpand=5, must not rewrite:\n$plan")
    } finally spark.conf.unset(RangeJoinRule.MaxExpandKey)
  }
}
