package graft

import graft.queries.TrainingDataQueries
import org.scalatest.funsuite.AnyFunSuite

/** Randomized brute-force parity for the degree-oriented triangle
  * counter: the orientation argument (each triangle has exactly ONE
  * vertex with both out-edges under a total-order orientation) is easy
  * to get subtly wrong — off-by-one tie handling double- or
  * zero-counts triangles on equal-degree vertices, which random
  * Erdős–Rényi graphs hit constantly.
  */
class TriangleFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** O(n·m) reference count: for each edge (a,b), intersect adjacency. */
  private def bruteTriangles(n: Int, edges: Set[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (a, b)) =>
      m.updated(a, m.getOrElse(a, Set.empty) + b)
        .updated(b, m.getOrElse(b, Set.empty) + a)
    }
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) intersect adj(b); if a < b && b < c) {
      counts(a) += 1; counts(b) += 1; counts(c) += 1
    }
    counts.toMap
  }

  test("triangleCounts matches brute force on random graphs (incl. degree ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 1 to 12) {
      val n = 6 + rnd.nextInt(25)
      // density swept from sparse to near-complete so equal-degree ties,
      // isolated vertices and big cliques all occur across trials
      val p = 0.1 + rnd.nextDouble() * 0.6
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextDouble() < p
      } yield (a, b)).toSet
      val want = bruteTriangles(n, edges)
      val edgeDf =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
        else edges.toSeq.toDF("doc_a", "doc_b")
      val got = TrainingDataQueries.triangleCounts(edgeDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial n=$n p=$p edges=${edges.size}")
    }
  }

  test("triangle-free and complete graphs are exact") {
    import spark.implicits._
    // 4-cycle: zero triangles
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)).toDF("doc_a", "doc_b")
    assert(TrainingDataQueries.triangleCounts(cycle).collect().isEmpty)
    // K5: every vertex sits on C(4,2) = 6 triangles
    val k5 = (for { a <- 0L until 5; b <- (a + 1) until 5 } yield (a, b))
      .toDF("doc_a", "doc_b")
    val got = TrainingDataQueries.triangleCounts(k5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 5).map(_ -> 6L).toMap)
  }
}
