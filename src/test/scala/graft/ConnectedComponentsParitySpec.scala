package graft

import graft.queries.{Shared, TrainingDataQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity of `connectedComponents`' two execution paths: the driver-side
  * union-find fast path (edge list under the budget — the battery's
  * candidate/label graphs) and the distributed pointer-jumping loop (the
  * at-scale fallback). Labels must be value-identical — the min node id
  * per component — on adversarial shapes: long chains (pointer-jumping's
  * worst case), stars, forests of mixed sizes, self-loops, duplicate
  * edges, and string ids.
  */
class ConnectedComponentsParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def labelsOf(edges: Seq[(Long, Long)], driver: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("doc_a", "doc_b")
    TrainingDataQueries
      .connectedComponents(df, driverMaxEdges = if (driver) 200000 else 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def assertParity(edges: Seq[(Long, Long)]): Unit = {
    val d = labelsOf(edges, driver = true)
    val x = labelsOf(edges, driver = false)
    assert(d === x, s"driver union-find != distributed loop on $edges")
  }

  test("chain: the pointer-jumping worst case") {
    assertParity((0L until 64L).map(i => (i, i + 1)))
    // reversed arrival order
    assertParity((0L until 64L).reverse.map(i => (i + 1, i)))
  }

  test("star + isolated pairs + duplicate and self edges") {
    val star = (1L to 20L).map(i => (100L, 100L + i))
    val pairs = Seq((1L, 2L), (3L, 4L), (2L, 1L), (7L, 7L), (3L, 4L))
    assertParity(star ++ pairs)
  }

  test("forest of mixed components with non-monotone ids") {
    val edges = Seq(
      (50L, 3L), (3L, 99L), (99L, 7L), // component min = 3
      (200L, 150L), (150L, 175L), // min = 150
      (11L, 12L)) // min = 11
    val d = labelsOf(edges, driver = true)
    assert(d(50L) === 3L && d(99L) === 3L && d(7L) === 3L)
    assert(d(200L) === 150L && d(175L) === 150L)
    assert(d(11L) === 11L && d(12L) === 11L)
    assertParity(edges)
  }

  test("pseudo-random graphs (fixed seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      assertParity(edges)
    }
  }

  test("string node ids take the same min label on both paths") {
    import spark.implicits._
    val df = Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("doc_a", "doc_b")
    def lbl(driver: Boolean) = TrainingDataQueries
      .connectedComponents(df, driverMaxEdges = if (driver) 1000 else 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val d = lbl(true)
    assert(d === lbl(false))
    assert(d("b") === "a" && d("x") === "x")
  }

  test("fallback triggers above the edge budget and still agrees") {
    import spark.implicits._
    val edges = (0L until 50L).map(i => (i, i + 1L))
    val df = edges.toDF("doc_a", "doc_b")
    // budget of 10 < 50 edges forces the distributed loop
    val viaFallback = TrainingDataQueries.connectedComponents(df, driverMaxEdges = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFallback === labelsOf(edges, driver = true))
    assert(viaFallback.values.toSet === Set(0L))
  }
}

/** The `Shared` opt-in materialization cache must never change values —
  * only skip recomputation. Pins collected-row equality of a shared vs
  * unshared run for the cached intermediates' heaviest consumers.
  */
class SharedIntermediatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir)
      .collect().map(_.mkString("|")).toSeq

  test("shared materialization is value-invisible") {
    assert(!Shared.enabled, "specs run with sharing disabled by default")
    val names = Seq("q_embed_neardup", "q_boruvka_mst", "q_probe_calibration",
      "q_linear_probe", "q_token_tf", "q_bm25_docs", "q_rm3_feedback",
      "q_hybrid_funnel")
    val plain = names.map(n => n -> rows(n)).toMap
    Shared.enable()
    try {
      val shared = names.map(n => n -> rows(n)).toMap
      // second pass reuses the checkpointed intermediate
      val shared2 = names.map(n => n -> rows(n)).toMap
      names.foreach { n =>
        assert(shared(n) === plain(n), s"$n changed under Shared")
        assert(shared2(n) === plain(n), s"$n changed on Shared reuse")
      }
    } finally Shared.disable()
  }
}
