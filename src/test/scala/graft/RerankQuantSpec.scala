package graft

import graft.text.Tokenizer
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the rerank/quantization/mixing additions —
  * RM3 pseudo-relevance feedback (`q_rm3_feedback`), MMR diversity
  * rerank (`q_mmr_rerank`), SQ8 scalar quantization (`q_sq8_quant`),
  * and α-temperature source mixing (`q_alpha_mix`) — each checked
  * against an independent in-memory recompute, beyond what the DuckDB
  * hash oracle pins.
  */
class RerankQuantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val embeddings: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  // --- q_mmr_rerank: full in-memory greedy MMR recompute ---------------------

  test("mmr rerank matches an in-memory integer greedy recompute") {
    val fp = embeddings.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1048576.0).toLong)
    }
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val qx = fp(0L)
    val rel = fp.collect { case (id, x) if id != 0L => id -> dot(x, qx) }
    val cand = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(24).toMap
    // round 1: pure relevance, ties to lowest vec_id
    var sel = Vector(cand.toSeq.minBy { case (id, r) => (-r, id) }._1)
    var rows = Vector((1L, sel.head, cand(sel.head), 0L))
    (2 to 8).foreach { r =>
      val remaining = cand.keySet -- sel
      val maxsim = remaining.map { id =>
        id -> sel.map(s => dot(fp(id), fp(s))).max }.toMap
      // argmax of 7·rel − 3·maxsim, ties to lowest vec_id
      val best = remaining.minBy(id => (3L * maxsim(id) - 7L * cand(id), id))
      sel :+= best
      rows :+= ((r.toLong, best, cand(best), maxsim(best)))
    }
    val got = run("q_mmr_rerank").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toVector
    assert(got === rows, "q_mmr_rerank diverges from the greedy recompute")
  }

  test("mmr list is diverse: every later pick beat the greedy trade-off") {
    // the round-r pick maximizes 7·rel − 3·maxsim over the remaining
    // pool, so its objective is >= that of any candidate picked later
    // (later rounds only ADD selected vectors, so maxsim is monotonely
    // nondecreasing for a fixed candidate)
    val got = run("q_mmr_rerank").collect()
      .map(x => (x.getLong(0), 7L * x.getLong(2) - 3L * x.getLong(3)))
    got.sliding(2).foreach { case Array((r1, o1), (r2, o2)) =>
      assert(r2 == r1 + 1)
      assert(o1 >= o2 || r1 == 1L,
        s"round $r2 objective $o2 exceeds round $r1's $o1")
    case _ => ()
    }
  }

  // --- q_sq8_quant: in-memory min/max-trained quantizer recompute ------------

  test("sq8 audit matches an in-memory quantize/reconstruct recompute") {
    val d = embeddings.values.head.length
    val expect = (0 until d).map { dim =>
      val vs = embeddings.values.map(_(dim)).toSeq
      val mn = vs.min; val mx = vs.max
      def code(v: Double): Long =
        if (mx == mn) 0L
        else math.min(255L, math.max(0L,
          math.floor((v - mn) * 255.0 / (mx - mn)).toLong))
      def recon(v: Double): Double = mn + code(v) * (mx - mn) / 255.0
      val nEdge = vs.count(v => code(v) == 0L || code(v) == 255L).toLong
      val sqErr = vs.map { v =>
        val e = v - recon(v); math.floor(e * e * 1e12 + 0.5).toLong }.sum
      (dim, math.floor(mn * 1e6 + 0.5) / 1e6, math.floor(mx * 1e6 + 0.5) / 1e6,
        nEdge, sqErr)
    }
    val got = run("q_sq8_quant").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect, "q_sq8_quant diverges from the recompute")
  }

  test("sq8 per-element reconstruction error is bounded by one code step") {
    // |v − recon(v)| < (mx − mn)/255 for interior codes, so the summed
    // fixed-point error is < n·((mx−mn)/255)²·1e12 + n/2 (the +0.5 floor)
    val n = embeddings.size
    run("q_sq8_quant").collect().foreach { r =>
      val span = r.getDouble(2) - r.getDouble(1)
      val step = span / 255.0
      val bound = n * (step * step * 1e12) + n // rounding slack
      assert(r.getLong(4) <= bound.toLong + 1,
        s"dim ${r.getInt(0)}: sq_err_fp ${r.getLong(4)} exceeds $bound")
    }
  }

  // --- q_alpha_mix: exact integer-sqrt + ppm-share recompute ------------------

  test("alpha mix matches an exact isqrt recompute and conserves ppm") {
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def isqrt(n: Long): Long = {
      var x = math.sqrt(n.toDouble).toLong
      while (x * x > n) x -= 1
      while ((x + 1) * (x + 1) <= n) x += 1
      x
    }
    val tn = langs.values.sum
    val tw = langs.values.map(isqrt).sum
    val expect = langs.toSeq.sortBy(_._1).map { case (l, n) =>
      (l, n, isqrt(n), n * 1000000L / tn, isqrt(n) * 1000000L / tw) }
    val got = run("q_alpha_mix").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect, "q_alpha_mix diverges from the isqrt recompute")
    // floor division loses < 1 ppm per language
    assert(got.map(_._4).sum > 1000000L - got.size &&
      got.map(_._4).sum <= 1000000L)
    assert(got.map(_._5).sum > 1000000L - got.size &&
      got.map(_._5).sum <= 1000000L)
    // temperature flattens: the largest language's share never grows,
    // the smallest language's share never shrinks
    val maxL = got.maxBy(_._2); val minL = got.minBy(_._2)
    assert(maxL._5 <= maxL._4, "alpha mix must downweight the head")
    assert(minL._5 >= minL._4, "alpha mix must upweight the tail")
  }

  // --- q_rm3_feedback: full in-memory BM25+RM3 recompute ----------------------

  test("rm3 feedback matches an in-memory two-pass BM25 recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Tokenizer.tokenize(r.getString(1))).toMap
    val nDocs = docs.size.toLong
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / nDocs
    val tf: Map[(Long, String), Long] = docs.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, os) => ((id, t), os.size.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val idfRaw = df.map { case (t, d) =>
      t -> (math.log(nDocs - d + 0.5) - math.log(d + 0.5)) }
    val avgIdf = idfRaw.values.sum / idfRaw.size
    val idf = idfRaw.map { case (t, v) =>
      t -> (if (v < 0) 0.25 * avgIdf else v) }
    def contrib(w: Double, id: Long, t: String): Double = {
      val dl = docs(id).size.toDouble
      w * idf(t) * (tf((id, t)) * (1.5 + 1)) /
        (tf((id, t)) + 1.5 * (1 - 0.75 + 0.75 * dl / avgdl))
    }
    // inner-join semantics: only docs with >= 1 matching term get a row
    // (scores may be 0 or negative — this corpus's common vocabulary
    // drives avg idf negative, so the epsilon floor is negative too)
    def score(weights: Map[String, Double]): Map[Long, Double] =
      docs.keys.flatMap { id =>
        val ms = weights.keys.filter(t => tf.contains((id, t))).toSeq
        if (ms.isEmpty) None
        else Some(id -> ms.map { t =>
          math.floor(contrib(weights(t), id, t) * 1e6 + 0.5).toLong
        }.sum / 1e6)
      }.toMap
    val qTerms = Tokenizer.tokenize("spark join table scan")
      .groupBy(identity).map { case (t, os) => t -> os.size.toDouble }
    val base = score(qTerms)
    val fb = base.toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1)
    val exp = fb.flatMap(id => docs(id).distinct.map(t => t -> tf((id, t))))
      .filter { case (t, _) => !qTerms.contains(t) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      .toSeq.sortBy { case (t, w) => (-w, t) }.take(8)
    val weights = qTerms ++ exp.map { case (t, _) => t -> 0.5 }
    val expect = score(weights).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val got = run("q_rm3_feedback").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) === expect.map(_._1),
      "q_rm3_feedback ranked ids diverge from the recompute")
    got.zip(expect).foreach { case ((id, g), (_, e)) =>
      assert(math.abs(g - e) <= 2e-6, s"doc $id: score $g vs $e")
    }
  }

  test("rm3 final list is a valid ranked cut: unique ids, sorted scores") {
    val got = run("q_rm3_feedback").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length <= 20)
    assert(got.map(_._1).distinct.length === got.length,
      "duplicate doc in RM3 list")
    got.sliding(2).foreach {
      case Array((i1, s1), (i2, s2)) =>
        assert(s1 > s2 || (s1 == s2 && i1 < i2), "RM3 list out of order")
      case _ => ()
    }
  }
}
