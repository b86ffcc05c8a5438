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

  test("below the bound, the knob does not change any of the seven queries") {
    for (q <- Seq("q_spearman", "q_assortativity", "q_cooccur_lift",
        "q_correlation", "q_burstiness", "q_ams_sketch", "q_gini_stump")) {
      def run(on: Boolean): Seq[String] = WideStats.withWide(on) {
        val rows = SparkEntry.queries(q)(spark, sfDir)
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

  test("pearson above the bound: default overflows loudly, wide is BigInt-exact") {
    import spark.implicits._
    // per-row x² = 1.6e19 > 2^63: wsumProd must widen BEFORE multiplying
    val rows = Seq(
      ("s", 4_000_000_000L, 7L), ("s", 4_000_000_100L, 9L),
      ("s", 4_000_000_050L, 8L), ("s", 4_000_000_200L, 13L))
    val d = rows.toDF("source", "x", "y")
    def r(on: Boolean): Double = WideStats.withWide(on) {
      graft.queries.CurationQueries.pearsonBySource(d)
        .collect().head.getDouble(2)
    }
    val n = BigInt(rows.size)
    val sx = rows.map(r => BigInt(r._2)).sum
    val sy = rows.map(r => BigInt(r._3)).sum
    val sxx = rows.map(r => BigInt(r._2) * r._2).sum
    val syy = rows.map(r => BigInt(r._3) * r._3).sum
    val sxy = rows.map(r => BigInt(r._2) * r._3).sum
    val expected = math.floor(
      (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble)) * 1e6 + 0.5) / 1e6
    assert(r(true) == expected, "wide pearson must match BigInt-exact r")
    val e = intercept[Exception](r(false))
    assert(e.toString.toLowerCase.contains("overflow"),
      s"default path should overflow above the bound, got: $e")
  }

  test("burstiness above the bound: default overflows loudly, wide is BigInt-exact") {
    import spark.implicits._
    // one bursty term, df = 5, tf = 3e9: Σtf² = 4.5e19 > 2^63; plus a
    // quiet term so the top-20 sort is non-trivial
    val tfRows = (0 until 5).map(i => (i.toLong, "burst", 3_000_000_000L)) ++
      (0 until 6).map(i => (i.toLong, "calm", 1L))
    val tf = tfRows.toDF("doc_id", "tok", "tf")
    val nd = Seq(Tuple1(8L)).toDF("nn")
    def vmr(on: Boolean): Map[String, Double] = WideStats.withWide(on) {
      graft.queries.TrainingDataQueries.vmrTop(tf, nd)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    }
    def exp(vals: Seq[Long]): Double = {
      val nn = BigInt(8)
      val sx = vals.map(BigInt(_)).sum
      val sx2 = vals.map(v => BigInt(v) * v).sum
      math.floor((nn * sx2 - sx * sx).toDouble / (nn * sx).toDouble * 1e6 + 0.5) / 1e6
    }
    val wide = vmr(true)
    assert(wide("burst") == exp(Seq.fill(5)(3_000_000_000L)))
    assert(wide("calm") == exp(Seq.fill(6)(1L)))
    val e = intercept[Exception](vmr(false))
    assert(e.toString.toLowerCase.contains("overflow"),
      s"default path should overflow above the bound, got: $e")
  }

  test("AMS F2 above the bound: default overflows loudly, wide is BigInt-exact") {
    import spark.implicits._
    val tfRows = (0 until 6).map(i => (s"t$i", 4_000_000_000L + i))
    val tf = tfRows.toDF("tok", "tf")
    def f2(on: Boolean): (BigInt, BigInt) = WideStats.withWide(on) {
      val r = ScaleQueries.amsFromTf(tf).collect().head
      (BigInt(r.getDecimal(2).toBigInteger), BigInt(r.getDecimal(3).toBigInteger))
    }
    val expected = tfRows.map(r => BigInt(r._2) * r._2).sum
    val (exact, est) = f2(true)
    assert(exact == expected, "wide f2_exact must be BigInt-exact")
    assert(est >= 0)
    val e = intercept[Exception](WideStats.withWide(false) {
      ScaleQueries.amsFromTf(tf).collect()
    })
    assert(e.toString.toLowerCase.contains("overflow"),
      s"default path should overflow above the bound, got: $e")
  }

  test("gini stump above the bound: default overflows loudly, wide is BigInt-exact") {
    import spark.implicits._
    // N = 150k > the 9.6e4 bound: nl²·1e9 ≈ 2.25e19 > 2^63 at the top
    // cumulative bins. y correlates with x so the stump is non-trivial.
    val n = 150000
    val rows = (0 until n).map { i =>
      val x = (i % 1000).toLong
      val y = if (x >= 600 && i % 5 != 0) 1L else if (i % 11 == 0) 1L else 0L
      (x, y)
    }
    val d = rows.toDF("x", "y")
    def stump(on: Boolean): (Long, BigInt, BigInt) = WideStats.withWide(on) {
      val r = ScaleQueries.giniStumpFrom(d).collect().head
      def big(i: Int): BigInt = r.get(i) match {
        case l: java.lang.Long => BigInt(l)
        case dec: java.math.BigDecimal => BigInt(dec.toBigInteger)
      }
      (r.getLong(0), big(5), big(7))
    }
    // driver-side BigInt replica of the 32-bin stump search
    val mn = rows.map(_._1).min
    val mx = rows.map(_._1).max
    val total = rows.size.toLong
    val pos = rows.map(_._2).sum
    val bins = rows.groupBy(r => (r._1 - mn) * 32 / (mx - mn + 1))
      .view.mapValues(rs => (rs.size.toLong, rs.map(_._2).sum)).toMap
    val ordered = bins.keys.toSeq.sorted
    var nl = 0L
    var pl = 0L
    var best: Option[(BigInt, Long, Long, Long)] = None // (purity, thr) picks
    for (b <- ordered) {
      val (nb, pb) = bins(b)
      nl += nb; pl += pb
      if (nl > 0 && nl < total) {
        val thr = mn + (b + 1) * (mx - mn + 1) / 32 - 1
        val nr = total - nl
        val pr = pos - pl
        def purity(p: BigInt, t: BigInt): BigInt =
          (p * p + (t - p) * (t - p)) * BigInt(1000000000L) / t
        val pf = purity(pl, nl) + purity(pr, nr)
        val better = best.forall { case (bp, bthr, _, _) =>
          pf > bp || (pf == bp && thr < bthr)
        }
        if (better) {
          val acc = (BigInt(math.max(pl, nl - pl)) +
            BigInt(math.max(pr, nr - pr))) * 1000000L / total
          best = Some((pf, thr, acc.toLong, nl))
        }
      }
    }
    val (expPurity, expThr, expAcc, _) = best.get
    val (thr, purityFp, accPpm) = stump(true)
    assert(thr == expThr, "wide stump must pick the BigInt-exact threshold")
    assert(purityFp == expPurity, "wide purity must be BigInt-exact")
    assert(accPpm == BigInt(expAcc))
    val e = intercept[Exception](stump(false))
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
