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

  private def l2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  // SQ8 codes trained on ALL vectors (query included), per-dim
  private lazy val sq8: (Long, Int) => Long = {
    val d = raw.values.head.length
    val mn = (0 until d).map(j => raw.values.map(_(j)).min)
    val mx = (0 until d).map(j => raw.values.map(_(j)).max)
    (id, j) =>
      if (mx(j) == mn(j)) 0L
      else math.min(255L, math.max(0L,
        math.floor((raw(id)(j) - mn(j)) * 255.0 / (mx(j) - mn(j))).toLong))
  }

  /** Code-space squared L2 to the query (vec 0). */
  private def codeL2(id: Long): Long = {
    val d = raw.values.head.length
    (0 until d).map { j => val x = sq8(id, j) - sq8(0L, j); x * x }.sum
  }

  // --- q_ndcg_eval: full in-memory recompute ---------------------------------

  test("ndcg eval matches an in-memory exact-vs-SQ8 recompute") {
    val K = 10
    val discFp = (1 to K).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    def gain(r: Int): Long = (1L << (K - r + 1)) - 1
    // ground truth: exact fixed-point squared L2 to query vec 0, ascending
    val qx = fp(0L)
    val truth = fp.collect { case (id, x) if id != 0L => id -> l2(x, qx) }
      .toSeq.sortBy { case (id, rel) => (rel, id) }.take(K)
      .zipWithIndex.map { case ((id, _), i) => id -> gain(i + 1) }.toMap
    // system under test: the SQ8 ADC (code-space L2) ranking, ascending
    val approx = raw.keys.filter(_ != 0L).map(id => id -> codeL2(id)).toSeq
      .sortBy { case (id, a) => (a, id) }.take(K)
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

  // --- q_rbo: in-memory rank-biased-overlap recompute -------------------------

  test("rbo matches an in-memory exact-vs-SQ8 prefix-overlap recompute") {
    val K = 10; val p = 0.9
    val wFp = (1 to K).map(d =>
      math.floor((1 - p) / p * math.pow(p, d) / d * 1e12).toLong)
    val wcum = (1 to K).map(m => wFp.drop(m - 1).sum)
    val qx = fp(0L)
    val exact = fp.collect { case (id, x) if id != 0L => id -> l2(x, qx) }
      .toSeq.sortBy { case (id, r) => (r, id) }.take(K)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val approx = raw.keys.filter(_ != 0L).map(id => id -> codeL2(id)).toSeq
      .sortBy { case (id, a) => (a, id) }.take(K)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val common = exact.keySet & approx.keySet
    val rboFp = common.toSeq
      .map(id => wcum(math.max(exact(id), approx(id)) - 1)).sum
    val got = run("q_rbo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    assert(got === ((common.size.toLong, rboFp,
      math.floor(rboFp.toDouble / 1e12 * 1e6 + 0.5) / 1e6)),
      "q_rbo diverges from the recompute")
    // prefix RBO is bounded by the full cumulative weight from rank 1
    assert(got._2 <= wcum.head * K, "rbo_fp exceeds its structural bound")
    assert(got._3 >= 0.0 && got._3 <= 1.0)
  }

  // --- q_ap_eval: in-memory average-precision recompute -----------------------

  test("ap/mrr match an in-memory precision-at-hit recompute") {
    val K = 10
    val qx = fp(0L)
    val exact = fp.collect { case (id, x) if id != 0L => id -> l2(x, qx) }
      .toSeq.sortBy { case (id, r) => (r, id) }.take(K).map(_._1).toSet
    val approx = raw.keys.filter(_ != 0L).map(id => id -> codeL2(id)).toSeq
      .sortBy { case (id, a) => (a, id) }.take(K)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }
    val hitRanks = approx.collect { case (id, rb) if exact(id) => rb }.sorted
    val apsum = hitRanks.zipWithIndex.map { case (rb, i) =>
      math.floor((i + 1).toDouble / rb.toDouble * 1e9 + 0.5).toLong }.sum
    val ap = math.floor(apsum.toDouble / K.toDouble / 1e9 * 1e6 + 0.5) / 1e6
    val mrr =
      if (hitRanks.isEmpty) 0.0
      else math.floor(1.0 / hitRanks.head.toDouble * 1e6 + 0.5) / 1e6
    val got = run("q_ap_eval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .head
    assert(got === ((K.toLong, hitRanks.size.toLong, ap, mrr)),
      "q_ap_eval diverges from the recompute")
    // AP is bounded by recall@K: ap <= n_hits / K
    assert(got._3 <= got._2.toDouble / K + 1e-9)
  }

  // --- q_kappa: in-memory contingency recompute -------------------------------

  test("kappa matches an in-memory contingency-table recompute") {
    // over the ENRICHED corpus twin, replayed byte-identically
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(1),
        EnrichReplay.text2(r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))))
    val stop = graft.text.Tokenizer.StopWords
    var (n11, n10, n01, n00) = (0L, 0L, 0L, 0L)
    rows.foreach { case (lang, text) =>
      val ts = text.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      val ratio = math.floor(
        ts.count(stop).toDouble / math.max(ts.length, 1) * 1e5 + 0.5) / 1e5
      val a = ratio >= 0.12
      val b = lang == "en"
      if (a && b) n11 += 1 else if (a && !b) n10 += 1
      else if (!a && b) n01 += 1 else n00 += 1
    }
    val n = n11 + n10 + n01 + n00
    val chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    val kappa = math.floor(
      (n * (n11 + n00) - chance).toDouble / (n * n - chance).toDouble
        * 1e6 + 0.5) / 1e6
    val got = run("q_kappa").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .head
    assert(got === ((n11, n10, n01, n00, kappa)),
      "q_kappa diverges from the recompute")
    // kappa is bounded, and on the enriched twin it must sit clearly
    // ABOVE chance (the raw corpus scored below chance — non-en docs
    // carry English tokens; the round-3 enrichment injects the
    // separability this audit needs to exercise its real path)
    assert(got._5 > 0.2 && got._5 <= 1.0)
  }

  // --- q_textrank_keywords: in-memory integer-PageRank recompute --------------

  test("textrank keywords match an in-memory co-occurrence PageRank") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sid(t: String): Long = java.lang.Long.parseLong(md5hex(t).take(10), 16)
    val stop = graft.text.Tokenizer.StopWords
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val adj = docs.flatMap { text =>
      val kept = text.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(t => t.nonEmpty && t.length >= 2 && !stop(t))
      kept.sliding(2).collect {
        case Array(a, b) if a != b =>
          if (a < b) (a, b) else (b, a)
      }
    }.distinct
    val vocab = adj.flatMap { case (a, b) => Seq(a, b) }.distinct
      .groupBy(sid).map { case (s0, ts) => s0 -> ts.min }
    val sym = adj.flatMap { case (a, b) =>
      Seq(sid(a) -> sid(b), sid(b) -> sid(a)) }
    val deg = sym.groupBy(_._1).map { case (n0, es) => n0 -> es.length.toLong }
    var r = deg.map { case (n0, _) => n0 -> 1000000000L }
    for (_ <- 0 until 3) {
      val cin = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum }
      r = deg.map { case (n0, _) => n0 -> (150000000L + 85L * cin(n0) / 100L) }
    }
    val expect = r.toSeq.map { case (n0, rk) => (vocab(n0), rk) }
      .sortBy { case (t, rk) => (-rk, t) }.take(15)
    val got = run("q_textrank_keywords").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(got === expect,
      "q_textrank_keywords diverges from the in-memory PageRank")
    // keywords must be content words: no stopwords, no single chars
    got.foreach { case (t, _) =>
      assert(t.length >= 2 && !stop(t), s"non-content keyword [$t]")
    }
  }

  private def wsToks(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)

  // --- q_burstiness: in-memory Fano-factor recompute --------------------------

  test("burstiness matches an in-memory variance-to-mean recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val nn = docs.length.toLong
    val tf = docs.flatMap(t => wsToks(t).groupBy(identity)
      .map { case (tok, os) => tok -> os.length.toLong })
    val expect = tf.groupBy(_._1).map { case (tok, xs) =>
      val df = xs.length.toLong
      val sx = xs.map(_._2).sum
      val sx2 = xs.map(x => x._2 * x._2).sum
      val vmr = math.floor(
        (nn * sx2 - sx * sx).toDouble / (nn * sx).toDouble * 1e6 + 0.5) / 1e6
      (tok, df, sx, vmr)
    }.filter(_._2 >= 5L).toSeq
      .sortBy { case (tok, _, _, vmr) => (-vmr, tok) }.take(20)
    val got = run("q_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expect, "q_burstiness diverges from the recompute")
    // a Poisson-scattered term has VMR 1; the top of the list must be
    // super-Poisson (that is what "bursty" means)
    assert(got.head._4 > 1.0, s"top burstiness ${got.head._4} not > 1")
  }

  // --- q_hill_tail: in-memory order-statistics recompute ----------------------

  test("hill tail index matches an in-memory spacing recompute") {
    val k = 50
    val xs = spark.read.parquet(s"$dir/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).filter(_ > 0)
      .sorted(Ordering[Long].reverse).take(k + 1)
    val ls = xs.map(x => math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong)
    val spacing = ls.sum - ls.length * ls.min
    val alpha = math.floor(k.toDouble * 1e9 / spacing * 1e4 + 0.5) / 1e4
    val got = run("q_hill_tail").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).head
    assert(got === ((k.toLong, xs.min, alpha)),
      "q_hill_tail diverges from the recompute")
    assert(got._3 > 0.0, "tail index must be positive")
  }

  // --- q_heaps_fit: in-memory prefix-vocabulary recompute ----------------------

  test("heaps fit matches an in-memory prefix-vocabulary recompute") {
    // over the ENRICHED corpus twin, replayed byte-identically
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => r.getLong(0) -> wsToks(EnrichReplay.text2(
        r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))))
    val m = rows.map(_._1).max
    def bkt(id: Long): Long = id * 10 / (m + 1) + 1
    val tokBkt = rows.groupBy { case (id, _) => bkt(id) }
      .map { case (b, ds) => b -> ds.map(_._2.length.toLong).sum }
    val termBkt = rows.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).map { case (_, os) => bkt(os.map(_._2).min) }
      .groupBy(identity).map { case (b, bs) => b -> bs.size.toLong }
    val pts = (1L to 10L).flatMap { i =>
      val nn = tokBkt.filter(_._1 <= i).values.sum
      val vv = termBkt.filter(_._1 <= i).values.sum
      if (nn > 0 && vv > 0) Some((
        math.floor(math.log(nn.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(vv.toDouble) * 1e6 + 0.5).toLong))
      else None
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val num = (n * sxy - sx * sy).toDouble
    val den = (n * sxx - sx * sx).toDouble
    val beta = math.floor(num / den * 1e4 + 0.5) / 1e4
    val lnk = math.floor(
      (sy.toDouble / 1e6 - num / den * (sx.toDouble / 1e6)) / n.toDouble
        * 1e4 + 0.5) / 1e4
    val got = run("q_heaps_fit").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).head
    assert(got === ((n, beta, lnk)), "q_heaps_fit diverges from the recompute")
    // sublinear but OPEN vocabulary growth: the raw generator vocabulary
    // saturates in the first prefix (beta = 0, the round-2 finding); the
    // enriched twin's ⌊√(16·doc_id+j)⌋ tail makes beta land strictly
    // inside (0, 1) — the non-trivial fit path
    assert(got._2 > 0.0 && got._2 < 1.0, s"heaps beta ${got._2} degenerate")
  }
}
