package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pigeonhole-recall proof for the banded SimHash Hamming join
  * (`q_simhash_hamming`): with b = d+1 disjoint bit-bands, EVERY pair
  * within Hamming distance d agrees exactly on at least one band — the
  * banding is a guarantee, not a probabilistic filter (Manku et al.,
  * WWW 2007). Asserted here by brute-forcing all O(n²) signature pairs
  * on the sf0.001 corpus and requiring set equality with the banded
  * join's output (both directions: no missed pair = recall 1.0, no
  * extra pair = the exact bit_count post-filter works).
  */
class SimhashHammingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("banded join == brute-force all-pairs at hamming <= 1") {
    val sigs = SparkEntry.queries("q_simhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 1
    } yield (a, b, java.lang.Long.bitCount(sa ^ sb))).toSet
    assert(brute.nonEmpty, "fixture has no near-dup pair — property vacuous")

    val banded = SparkEntry.queries("q_simhash_hamming")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"missed=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
  }

  test("candidate join is keyed (no cartesian) and bands explode x2 only") {
    val p = SparkEntry.queries("q_simhash_hamming")(spark, dir)
      .queryExecution.executedPlan.toString
    // the pair generator must be an equi-join on (band, value) — a theta
    // or cartesian pair scan is the N² scale-killer the banding exists
    // to avoid
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("Generate explode"), p.take(3000))
  }
}
