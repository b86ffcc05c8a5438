package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the selection/dedup additions — the Gonzalez
  * k-center coreset (`q_kcenter`), SoftDeDup cluster reweighting
  * (`q_soft_dedup`), and the exact-substring near-dup audit
  * (`q_common_substring`) — each checked against an independent
  * in-memory recompute, beyond what the DuckDB hash oracle pins.
  */
class SelectionOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // --- q_kcenter: full in-memory Gonzalez recompute --------------------------

  test("kcenter matches an in-memory Gonzalez farthest-point recompute") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray))
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // seed: lowest (md5(vec_id), vec_id)
    val seed = vecs.keys.minBy(id => (md5hex(id.toString), id))
    var centers = Vector(seed)
    while (centers.size < 4) {
      val mind = vecs.map { case (id, x) =>
        id -> centers.map(c => d2(x, vecs(c))).min }
      val mx = mind.values.max
      centers :+= mind.collect { case (id, d) if d == mx => id }.min
    }
    // nearest-center assignment, ties to the earliest-selected cid
    val assign = vecs.map { case (id, x) =>
      id -> centers.zipWithIndex.map { case (c, i) =>
        d2(x, vecs(c)) * 16 + i }.min }
    val expect = assign.values.groupBy(_ % 16).map { case (cid, keys) =>
      (cid, centers(cid.toInt), keys.size.toLong, keys.map(_ / 16).max)
    }.toSeq.sortBy(_._1)
    val got = run("q_kcenter").orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect,
      "q_kcenter diverges from the in-memory Gonzalez recompute")
  }

  test("kcenter invariant: pairwise center distance >= every cluster radius") {
    // Gonzalez's 2-approximation argument: each center was the farthest
    // point when selected, so the min pairwise center distance bounds
    // the final covering radius from above (in squared-L2, both sides
    // squared — the comparison is order-preserving).
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1048576.0).toLong).toArray))
      .toMap
    val out = run("q_kcenter").collect()
    val centers = out.map(r => r.getLong(1))
    val maxRadius = out.map(r => r.getLong(3)).max
    val minPair = (for {
      i <- centers.indices; j <- centers.indices if i < j
      a = vecs(centers(i)); b = vecs(centers(j))
    } yield {
      var s = 0L; var k = 0
      while (k < a.length) { val d = a(k) - b(k); s += d * d; k += 1 }
      s
    }).min
    assert(minPair >= maxRadius,
      s"min pairwise center dist $minPair < max radius $maxRadius — " +
        "farthest-point selection violated")
  }

  // --- q_soft_dedup: conservation against the cluster table ------------------

  test("soft_dedup weights reconcile with q_dedup_clusters exactly") {
    val soft = run("q_soft_dedup").collect()
    val clusters = run("q_dedup_clusters").collect()
      .map(r => r.getLong(1)) // n_docs per cluster
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val totDocs = soft.map(_.getLong(1)).sum
    val totClustered = soft.map(_.getLong(2)).sum
    val totEff = soft.map(_.getLong(3)).sum
    assert(totDocs === nDocs, "per-source doc counts must cover the corpus")
    assert(totClustered === clusters.map(n => if (n > 1) n else 0L).sum,
      "clustered-doc total must equal the multi-doc cluster membership")
    val expectEff = (nDocs - totClustered) * 1000000L +
      clusters.filter(_ > 1).map(n => n * (1000000L / n)).sum
    assert(totEff === expectEff,
      "effective corpus size must be singletons at 1e6 plus n*(1e6 div n) per cluster")
    soft.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1) * 1000000L,
        s"source ${r.getString(0)}: effective size exceeds raw size")
    }
  }

  // --- q_common_substring: soundness (DP LCS) + planted completeness ---------

  private def windows(): Map[Long, String] = {
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0)
        val text = r.getString(1)
        val g = (id / 16).toString
        val t2 = if (id % 2 == 0)
          text + " sp" + g + "-" + md5hex("pass" + g) + md5hex("sage" + g)
        else text
        id -> (if (t2.length > 240) t2.substring(t2.length - 240) else t2)
      }.toMap
  }

  /** Longest common substring by the O(nm) rolling DP row. */
  private def lcs(a: String, b: String): Int = {
    var prev = new Array[Int](b.length + 1)
    var cur = new Array[Int](b.length + 1)
    var best = 0
    var i = 1
    while (i <= a.length) {
      var j = 1
      while (j <= b.length) {
        cur(j) = if (a.charAt(i - 1) == b.charAt(j - 1)) prev(j - 1) + 1 else 0
        if (cur(j) > best) best = cur(j)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    best
  }

  test("common_substring is sound: every reported run is a real common substring") {
    val w = windows()
    val rows = run("q_common_substring").collect()
    assert(rows.nonEmpty, "expected planted pairs at sf0.001")
    rows.foreach { r =>
      val (a, b, maxRun) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val true_ = lcs(w(a), w(b))
      assert(maxRun <= true_,
        s"pair ($a,$b): reported max_run $maxRun exceeds true LCS ${true_}")
      assert(maxRun >= 40, s"pair ($a,$b): below the report threshold")
    }
  }

  test("common_substring is complete on the planted passages") {
    // Every pair of even docs in the same doc_id div 16 group shares the
    // aperiodic ~69-char md5 tail; all its grams are group-unique (df ~ 8,
    // under the cap), so the pair MUST be reported with max_run >= 60.
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val planted = ids.filter(_ % 2 == 0).groupBy(_ / 16).values
      .flatMap(g => for (i <- g.indices; j <- g.indices if i < j)
        yield (g(i), g(j)))
      .toSet
    val got = run("q_common_substring").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    val missing = planted -- gotPairs
    assert(missing.isEmpty, s"planted pairs not reported: ${missing.take(5)}")
    got.filter(t => planted((t._1, t._2))).foreach { case (a, b, maxRun) =>
      assert(maxRun >= 60, s"planted pair ($a,$b) reports max_run $maxRun < 60")
    }
  }
}
