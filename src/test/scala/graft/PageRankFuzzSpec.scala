package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** Randomized brute-force parity for the integer-exact PageRank: the
  * driver-side reference replays the same Long fixed-point recurrence
  * (r' = 0.15·scale + 0.85·Σ_in (r div deg)) over an adjacency map, so
  * any divergence in iteration wiring, integer-division placement, or
  * the inner-join node set shows up as an exact mismatch. Random
  * Erdős–Rényi graphs sweep sparse chains to near-cliques.
  */
class PageRankFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Scale = 1000000000L

  /** Driver reference: identical integer recurrence over adjacency. */
  private def brutePageRank(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (a, b)) =>
      m.updated(a, m.getOrElse(a, Set.empty) + b)
        .updated(b, m.getOrElse(b, Set.empty) + a)
    }
    var r = adj.keys.map(_ -> Scale).toMap
    for (_ <- 0 until iters) {
      r = adj.map { case (v, ns) =>
        val cin = ns.iterator.map(u => r(u) / adj(u).size).sum
        v -> (15L * Scale / 100 + 85L * cin / 100)
      }
    }
    r
  }

  test("pageRank matches the driver-side integer recurrence on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 1 to 10) {
      val n = 5 + rnd.nextInt(25)
      val p = 0.08 + rnd.nextDouble() * 0.5
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < p
      } yield (a, b)).toSet
      if (edges.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val want = brutePageRank(edges, iters)
        val got = TrainingDataQueries
          .pageRank(edges.toSeq.toDF("doc_a", "doc_b"), iters)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial n=$n p=$p iters=$iters")
      }
    }
  }

  test("structure sanity: hub outranks leaves; regular graphs are uniform") {
    import spark.implicits._
    // star K1,5: the hub receives 5 full contributions, leaves 1/5 each
    val star = (1L to 5L).map(b => (0L, b)).toDF("doc_a", "doc_b")
    val starRanks = TrainingDataQueries.pageRank(star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(l => starRanks(0L) > starRanks(l)))
    assert((1L to 5L).map(starRanks).toSet.size == 1)
    // C4 (2-regular): rank mass stays exactly uniform at every iteration
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("doc_a", "doc_b")
    val cycleRanks = TrainingDataQueries.pageRank(cycle)
      .collect().map(_.getLong(1)).toSet
    assert(cycleRanks.size == 1)
  }
}
