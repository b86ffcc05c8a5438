package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the clustering additions — the centroid
  * silhouette (`q_silhouette`) and DBSCAN (`q_dbscan`) — beyond the
  * DuckDB hash oracle (which already pins exact values against an
  * INDEPENDENT engine, including a recursive-CTE connected-components
  * twin for DBSCAN's core chaining).
  */
class ClusterOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val nVecs = spark.read
    .parquet(s"$dir/embeddings.parquet").count()

  // --- q_silhouette ------------------------------------------------------------

  test("silhouette partitions the corpus exactly like q_kmeans") {
    // same centroid table, same argmin, same tie rule → the per-cluster
    // populations must agree row for row
    val sil = run("q_silhouette").select("cluster", "n_vecs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val km = run("q_kmeans").select("cluster", "n_vecs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sil === km, "silhouette/kmeans cluster populations diverge")
    assert(sil.values.sum === nVecs, "silhouette drops or duplicates vectors")
  }

  test("silhouette coefficients are bounded: -1 <= mean_sil <= 1") {
    run("q_silhouette").collect().foreach { r =>
      val s = r.getDouble(2)
      assert(s >= -1.0 && s <= 1.0, s"cluster ${r.getLong(0)}: mean_sil $s")
    }
  }

  // --- q_dbscan ----------------------------------------------------------------

  test("dbscan conserves the corpus: core + border + noise = N") {
    val rows = run("q_dbscan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val noise = rows.filter(_._1 == -1L)
    assert(noise.length === 1, "exactly one noise row expected")
    assert(noise.head._2 === 0L, "the noise row carries no core points")
    val total = rows.map(r => r._2 + r._3).sum
    assert(total === nVecs, s"dbscan rows cover $total of $nVecs vectors")
  }

  test("dbscan clusters are core-anchored with min-id representatives") {
    val rows = run("q_dbscan").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 != -1L)
    assert(rows.nonEmpty, "no clusters found at sf0.001")
    rows.foreach { case (rep, nCore, _) =>
      assert(nCore >= 1L, s"cluster $rep has no core points")
      assert(rep >= 0L, s"cluster rep $rep out of id range")
    }
    // representatives are distinct min-labels → strictly increasing sorted
    assert(rows.map(_._1).distinct.length === rows.length)
  }
}
