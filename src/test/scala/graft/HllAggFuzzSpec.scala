package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz for the `graft_hll` aggregate beyond the oracle's exactness
  * check: (a) partition-invariance (a buggy merge shows up as
  * layout-to-layout drift), (b) bit-equality with plain-Scala reference
  * register math, (c) duplicate-insensitivity (the sketch is a SET
  * summary — re-inserting rows must not move it), and (d) the
  * STATISTICAL claim: the raw estimator's relative error stays within
  * 4·(1.04/√m) ≈ 26% for cardinalities in the raw regime (the oracle
  * certifies the arithmetic; this certifies the sketch is actually a
  * good estimator, which no hash comparison can).
  */
class HllAggFuzzSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.register(s)
    s
  }

  private val M = 256
  private val MaxRho = 41 // 48-bit hash, p = 8

  /** The aggregate's register math, in plain Scala. */
  private def hllRef(hashes: Iterable[Long]): (Double, Long) = {
    val regs = new Array[Int](M)
    hashes.foreach { h =>
      val b = (h & (M - 1)).toInt
      val w = h >>> 8
      val rho =
        if (w == 0L) MaxRho
        else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(b)) regs(b) = rho
    }
    var s = 0L
    var z = 0L
    regs.foreach { r => s += 1L << (MaxRho - r); if (r == 0) z += 1 }
    val alpha = 0.7213 / (1 + 1.079 / M)
    (alpha * M * M * (1L << MaxRho).toDouble / s.toDouble, z)
  }

  test("graft_hll: partition-invariant, reference-exact, duplicate-insensitive, within 4-sigma") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 1 to 6) {
      // distinct cardinality well above 2.5·m so the raw (no linear
      // counting) regime is the right one
      val d = 1500 + rnd.nextInt(15000)
      val distinct = {
        val set = scala.collection.mutable.LinkedHashSet.empty[Long]
        while (set.size < d) set += (rnd.nextLong() & ((1L << 48) - 1))
        set.toVector
      }
      // duplicate a random subset a few times — must not move the sketch
      val dups = Vector.fill(d / 2)(distinct(rnd.nextInt(d)))
      val (wantEst, wantZeros) = hllRef(distinct)

      for (parts <- Seq(1, 5, 9); rows <- Seq(distinct, distinct ++ dups)) {
        val got = rows.toDF("h")
          .repartition(parts)
          .agg(expr("graft_hll(h, 8)").as("sk"))
          .select(col("sk.est_distinct"), col("sk.zero_registers"))
          .collect().head
        assert(got.getDouble(0) == wantEst && got.getLong(1) == wantZeros,
          s"trial $trial parts $parts dups ${rows.size - d}: " +
            s"(${got.getDouble(0)}, ${got.getLong(1)}) != ($wantEst, $wantZeros)")
      }
      val relErr = math.abs(wantEst / d - 1.0)
      assert(relErr < 4 * 1.04 / math.sqrt(M),
        s"trial $trial: estimate $wantEst for true $d — rel err $relErr")
    }
  }
}
