package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the ranking/projection/corpus-shape audits —
  * nDCG of the SQ8 code-space ranking (`q_ndcg_eval`), the JL
  * sign-projection distortion audit (`q_jl_project`), and the
  * Zipf-exponent fit (`q_zipf_fit`) — each checked against an
  * independent in-memory recompute, beyond what the DuckDB hash oracle
  * pins.
  */
class RankingAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val raw: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
  private lazy val fp: Map[Long, Array[Long]] =
    raw.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1048576.0).toLong) }

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  // --- q_ndcg_eval: full in-memory recompute ---------------------------------

  test("ndcg eval matches an in-memory exact-vs-SQ8 recompute") {
    val K = 10
    val discFp = (1 to K).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    def gain(r: Int): Long = (1L << (K - r + 1)) - 1
    // ground truth: exact fixed-point dot to query vec 0
    val qx = fp(0L)
    val truth = fp.collect { case (id, x) if id != 0L => id -> dot(x, qx) }
      .toSeq.sortBy { case (id, rel) => (-rel, id) }.take(K)
      .zipWithIndex.map { case ((id, _), i) => id -> gain(i + 1) }.toMap
    // SQ8 codes trained on ALL vectors (query included)
    val d = raw.values.head.length
    val mn = (0 until d).map(j => raw.values.map(_(j)).min)
    val mx = (0 until d).map(j => raw.values.map(_(j)).max)
    def code(id: Long, j: Int): Long =
      if (mx(j) == mn(j)) 0L
      else math.min(255L, math.max(0L,
        math.floor((raw(id)(j) - mn(j)) * 255.0 / (mx(j) - mn(j))).toLong))
    val qc = (0 until d).map(code(0L, _)).toArray
    val approx = raw.keys.filter(_ != 0L).map { id =>
      id -> (0 until d).map(j => code(id, j) * qc(j)).sum }.toSeq
      .sortBy { case (id, a) => (-a, id) }.take(K)
    val expect = Seq(1, 5, 10).map { k =>
      val dcg = approx.take(k).zipWithIndex.map { case ((id, _), i) =>
        truth.getOrElse(id, 0L) * discFp(i) }.sum
      val idcg = (1 to k).map(r => gain(r) * discFp(r - 1)).sum
      (k.toLong, dcg, idcg,
        math.floor(dcg.toDouble / idcg.toDouble * 1e6 + 0.5) / 1e6)
    }
    val got = run("q_ndcg_eval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expect, "q_ndcg_eval diverges from the recompute")
  }

  test("ndcg is a valid normalized metric: 0 <= ndcg <= 1, dcg <= idcg") {
    run("q_ndcg_eval").collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"k=${r.getLong(0)}: dcg ${r.getLong(1)} > idcg ${r.getLong(2)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  // --- q_jl_project: in-memory sign-projection recompute ---------------------

  test("jl projection audit matches an in-memory md5-sign recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sgn(dim: Int, p: Int): Long =
      (java.lang.Long.parseLong(md5hex(s"${dim}_$p").substring(0, 1), 16) % 2) * 2 - 1
    val m = 16
    val ratios = fp.keys.filter(id => id % 8 == 0 && fp.contains(id + 1))
      .toSeq.sorted.flatMap { a =>
        val dv = fp(a).zip(fp(a + 1)).map { case (x, y) => x - y }
        val d2o = dv.map(v => v * v).sum
        if (d2o == 0L) None
        else {
          val d2p = (0 until m).map { p =>
            val yd = dv.indices.map(j => dv(j) * sgn(j, p)).sum
            yd * yd
          }.sum
          Some(math.floor(d2p.toDouble / (m.toDouble * d2o.toDouble) * 1e6 + 0.5).toLong)
        }
      }
    val expect = (ratios.size.toLong, ratios.min, ratios.max,
      math.floor(ratios.sum.toDouble / ratios.size / 1e6 * 1e4 + 0.5) / 1e4)
    val got = run("q_jl_project").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).head
    assert(got === expect, "q_jl_project diverges from the recompute")
    // JL guarantee sanity: the mean squared-distance ratio concentrates
    // around 1 (E = 1 exactly; sd ~ sqrt(2/m)/sqrt(n) for the mean)
    assert(got._4 > 0.5 && got._4 < 1.5,
      s"mean distortion ratio ${got._4} violates JL concentration")
    assert(got._2 > 0L, "a projected distance collapsed to zero")
  }

  // --- q_zipf_fit: in-memory OLS recompute ------------------------------------

  test("zipf fit matches an in-memory fixed-point OLS recompute") {
    val freqs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(r => r.getString(0).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val head = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
    val lx = head.indices.map(i =>
      math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong)
    val ly = head.map { case (_, f) =>
      math.floor(math.log(f.toDouble) * 1e6 + 0.5).toLong }
    val n = head.size.toLong
    val sx = lx.sum; val sy = ly.sum
    val sxy = lx.zip(ly).map { case (a, b) => a * b }.sum
    val sxx = lx.map(a => a * a).sum
    val num = (n * sxy - sx * sy).toDouble
    val den = (n * sxx - sx * sx).toDouble
    val slope = math.floor(num / den * 1e4 + 0.5) / 1e4
    val intercept = math.floor(
      (sy.toDouble / 1e6 - num / den * (sx.toDouble / 1e6)) / n.toDouble
        * 1e4 + 0.5) / 1e4
    val got = run("q_zipf_fit").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).head
    assert(got === ((n, head.head._2, slope, intercept)),
      "q_zipf_fit diverges from the recompute")
    // corpus-shape sanity: frequency decays with rank (negative slope)
    // and the fitted head frequency is positive
    assert(got._3 < 0.0, s"zipf slope ${got._3} is not negative")
  }
}
