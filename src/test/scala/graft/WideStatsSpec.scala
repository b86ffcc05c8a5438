package graft

import graft.queries.{ScaleQueries, WideStats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DECIMAL(38) escape hatch (`WideStats`): below the BIGINT bound
  * the knob changes nothing; above it the default BIGINT path overflows
  * loudly (ANSI, the Spark 4 default — with ANSI off it would wrap
  * silently) while the wide path stays exact, verified against
  * driver-side BigInt arithmetic. Wrong-by-wrap results are impossible
  * with the knob on.
  */
class WideStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("below the bound, the knob does not change any of the three queries") {
    for (q <- Seq("q_spearman", "q_assortativity", "q_cooccur_lift")) {
      def run(on: Boolean): Seq[String] = WideStats.withWide(on) {
        val rows = ScaleQueries.queries(q)(spark, sfDir)
          .collect().toSeq.map(_.toString)
        spark.catalog.clearCache()
        rows.sorted
      }
      assert(run(false) == run(true), s"$q: knob changed a below-bound result")
    }
  }

  test("spearman above the BIGINT bound: default overflows loudly, wide is BigInt-exact") {
    import spark.implicits._
    // n = 60k docs with injected ties: n·saa ≈ (4/3)n⁴ ≈ 1.7e19 > 2^63.
    // xa/xb correlated with deterministic noise so rho is non-trivial.
    val n = 60000
    val rows = (0 until n).map { i =>
      val xa = (i / 3).toLong // ties of size 3
      val xb = if (i % 7 == 0) (n - i).toLong else (i / 2).toLong
      (i.toLong, xa, xb)
    }
    val d = rows.toDF("doc_id", "xa", "xb")

    def rho(on: Boolean): Double = WideStats.withWide(on) {
      ScaleQueries.spearmanFromPairs(d).collect().head.getDouble(1)
    }

    // driver-side exact replica with BigInt (2x-scaled tie-averaged ranks)
    def ranks2(xs: Seq[Long]): Map[Long, BigInt] = {
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sortedVals = counts.keys.toSeq.sorted
      var below = 0L
      sortedVals.map { v =>
        val r2 = BigInt(2) * below + counts(v) + 1
        below += counts(v)
        v -> r2
      }.toMap
    }
    val ra = ranks2(rows.map(_._2))
    val rb = ranks2(rows.map(_._3))
    val pairs = rows.map { case (_, xa, xb) => (ra(xa), rb(xb)) }
    val bn = BigInt(n)
    val sa = pairs.map(_._1).sum
    val sb = pairs.map(_._2).sum
    val sab = pairs.map(p => p._1 * p._2).sum
    val saa = pairs.map(p => p._1 * p._1).sum
    val sbb = pairs.map(p => p._2 * p._2).sum
    assert(bn * saa > BigInt(Long.MaxValue), "test data must exceed the BIGINT bound")
    val num = (bn * sab - sa * sb).toDouble
    val den = math.sqrt((bn * saa - sa * sa).toDouble * (bn * sbb - sb * sb).toDouble)
    val expected = math.floor(num / den * 1e6 + 0.5) / 1e6

    assert(rho(true) == expected, "wide path must match BigInt-exact rho")
    // ANSI (the Spark 4 default) raises on the Θ(n⁴) product — loud, not
    // silent; with ANSI off it would wrap silently. Either way the knob
    // is the remedy past the bound.
    val e = intercept[Exception](rho(false))
    assert(e.toString.toLowerCase.contains("overflow"),
      s"default path should overflow above the bound, got: $e")
  }

  test("lift ppm above the BIGINT bound: default overflows loudly, wide is BigInt-exact") {
    import spark.implicits._
    // n_ab·n_users·1e6 ≈ 1.6e25 — far past BIGINT, trivially inside 1e38
    val d = Seq((4_000_000_000L, 4_000_000_000L, 5_000_000_000L, 6_000_000_000L))
      .toDF("n_ab", "n_users", "n_a", "n_b")
    val expected =
      (BigInt(4000000000L) * BigInt(4000000000L) * 1000000 /
        (BigInt(5000000000L) * BigInt(6000000000L))).toLong

    def lift(on: Boolean): Long = WideStats.withWide(on) {
      d.select(ScaleQueries.liftPpmCol.as("lift_ppm")).collect().head.getLong(0)
    }
    assert(lift(true) == expected)
    val e = intercept[Exception](lift(false))
    assert(e.toString.toLowerCase.contains("overflow"),
      s"default path should overflow above the bound, got: $e")
  }

  test("assortativity moments above the bound: wide products are exact") {
    import spark.implicits._
    // pre-aggregated moments where m2·sxy wraps BIGINT
    val m2 = 2_000_000_000L
    val sxy = 9_000_000_000L
    val sx = 3_000_000_000L
    val d = Seq((m2, sxy, sx)).toDF("m2", "sxy", "sx")
    val expected = (BigInt(m2) * BigInt(sxy) - BigInt(sx) * BigInt(sx))
    def num(on: Boolean): BigDecimal = WideStats.withWide(on) {
      val c = WideStats.prod(col("m2"), col("sxy")) -
        WideStats.prod(col("sx"), col("sx"))
      BigDecimal(d.select(c.cast("decimal(38,0)")).collect().head.getDecimal(0))
    }
    assert(num(true) == BigDecimal(expected))
    val e = intercept[Exception](num(false))
    assert(e.toString.toLowerCase.contains("overflow"),
      s"default path should overflow above the bound, got: $e")
  }
}
