package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the scale-infrastructure quartet
  * ([[graft.queries.ScaleQueries]]) that the DuckDB hash oracle cannot
  * express — the winnowing guarantee, Lloyd-step conservation, rollup
  * grain consistency, and canonicalization invariants.
  */
class ScaleQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  // --- winnowing -----------------------------------------------------------

  test("winnowing guarantee: every footer-planted doc shares a fingerprint") {
    // The planted footer (doc_id % 7 == 0) is far longer than k + w - 1,
    // so the Schleimer/Wilkerson/Aiken theorem REQUIRES at least one
    // shared fingerprint between any two docs carrying it — n_shared >= 1
    // for every planted doc (there are many at sf0.001, so each has a
    // partner).
    val out = run("q_winnowing").persist()
    try {
      val planted = out.filter(col("doc_id") % 7 === 0)
      assert(planted.count() >= 2, "need >=2 planted docs for the property")
      val violating = planted.filter(col("n_shared") < 1).count()
      assert(violating === 0,
        "a footer-planted doc has zero shared fingerprints — the winnowing " +
          "window-min guarantee is broken")
    } finally out.unpersist()
  }

  test("winnowing fingerprints: share_frac in [0,1] and n_shared <= n_fp") {
    val bad = run("q_winnowing")
      .filter(col("n_shared") > col("n_fp") ||
        col("share_frac") < 0 || col("share_frac") > 1)
      .count()
    assert(bad === 0)
  }

  // --- k-means ---------------------------------------------------------------

  test("kmeans conserves vectors and bounds the cluster ids") {
    val out = run("q_kmeans").persist()
    try {
      val total = out.agg(sum("n_vecs")).head.getLong(0)
      val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
      assert(total === nVecs, "every vector must be assigned exactly once")
      val badCid = out.filter(col("cluster") < 0 || col("cluster") > 7).count()
      assert(badCid === 0)
      val negInertia = out.filter(col("inertia") < 0).count()
      assert(negInertia === 0, "squared-L2 inertia cannot be negative")
    } finally out.unpersist()
  }

  test("kmeans second-iteration inertia does not exceed first-iteration inertia") {
    // Lloyd's theorem: re-assigning to the UPDATED centroids can only
    // lower (or keep) the summed squared distance relative to assigning
    // to those same centroids' parents. Recompute iteration-1 inertia
    // against the seed centroids and compare.
    import graft.queries.Tables.t
    val fp = t(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT))").as("x"))
      .persist()
    try {
      val seed = fp.withColumn("m", md5(col("vec_id").cast("string")))
        .orderBy("m", "vec_id").limit(8)
        .withColumn("cid", (row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("m", "vec_id")) - 1).cast("long"))
        .select(col("cid"), col("x").as("c"))
      val inertia1 = fp.crossJoin(broadcast(seed))
        .withColumn("dist",
          expr("aggregate(zip_with(x, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)"))
        .groupBy("vec_id").agg(min("dist").as("d"))
        .agg(sum("d")).head.getLong(0)
      val inertia2 = run("q_kmeans").agg(sum("inertia")).head.getLong(0)
      assert(inertia2 <= inertia1,
        s"Lloyd step increased inertia: $inertia1 -> $inertia2")
    } finally fp.unpersist()
  }

  // --- grouping sets -----------------------------------------------------------

  test("grouping-sets grains are mutually consistent") {
    val out = run("q_grouping_sets").persist()
    try {
      // gid 0 = (lang, source) detail; gid 1 = lang subtotal (source
      // aggregated away); gid 2 = source subtotal. Detail must re-sum to
      // each subtotal grain exactly.
      val detail = out.filter(col("gid") === 0)
      val byLang = detail.groupBy("lang")
        .agg(sum("n_docs").as("d_docs"), sum("chars").as("d_chars"))
      val langGrain = out.filter(col("gid") === 1)
        .select(col("lang"), col("n_docs"), col("chars"))
      val mism = langGrain.join(byLang, "lang")
        .filter(col("n_docs") =!= col("d_docs") || col("chars") =!= col("d_chars"))
        .count()
      assert(mism === 0, "lang subtotal grain disagrees with detail re-sum")
      val bySource = detail.groupBy("source").agg(sum("n_docs").as("d_docs"))
      val mism2 = out.filter(col("gid") === 2).join(bySource, "source")
        .filter(col("n_docs") =!= col("d_docs")).count()
      assert(mism2 === 0, "source subtotal grain disagrees with detail re-sum")
    } finally out.unpersist()
  }

  // --- URL canonicalization ------------------------------------------------------

  test("url canonicalization invariants: no www domains, dupes consistent") {
    val out = run("q_url_canonical").persist()
    try {
      assert(out.filter(col("domain").startsWith("www.")).count() === 0,
        "www. prefix must be stripped from the canonical domain")
      val bad = out.filter(col("n_canonical") > col("n_urls") ||
        col("n_dupes") =!= col("n_urls") - col("n_canonical") ||
        col("n_tracked") > col("n_urls")).count()
      assert(bad === 0)
      // the planted %400 path bucket forces real dupes at any sf with
      // >400 docs per (source, lang) — at sf0.001 just require >=0 and
      // that the total rows match the (source, lang) domain space
      assert(out.count() > 0)
    } finally out.unpersist()
  }

  // --- Z-order layout ------------------------------------------------------

  test("zorder: bit interleave is exact and every doc lands in one bucket") {
    // interleave(x=3, y=5): x bits {0,1} -> z bits {0,2} = 5;
    // y bits {0,2} -> z bits {1,5} = 34; z = 39.
    val z = spark.range(1).selectExpr(
      """aggregate(sequence(0, 7), 0L, (acc, j) ->
        |  acc + shiftleft(CAST(shiftright(3L, j) & 1 AS BIGINT), 2 * j)
        |      + shiftleft(CAST(shiftright(5L, j) & 1 AS BIGINT), 2 * j + 1))
        |""".stripMargin.trim + " AS z").head.getLong(0)
    assert(z === 39L)
    val out = run("q_zorder_layout")
    val total = out.agg(sum("n_docs")).head.getLong(0)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total === nDocs, "bucket assignment must partition the corpus")
    val bad = out.filter(col("min_x") < 0 || col("max_x") > 255 ||
      col("min_y") < 0 || col("max_y") > 255 ||
      col("min_x") > col("max_x") || col("min_y") > col("max_y")).count()
    assert(bad === 0)
  }

  test("zorder buckets bound BOTH dimensions (the point of Morton order)") {
    // A Morton bucket of 2048 consecutive z values covers an aligned
    // 32x64 (or 64x32) tile of the 256x256 grid — so per-bucket spans
    // are structurally bounded on BOTH axes, which a 1-D sort cannot do
    // for its trailing dimension.
    val viol = run("q_zorder_layout")
      .filter(col("max_x") - col("min_x") > 63 ||
        col("max_y") - col("min_y") > 63).count()
    assert(viol === 0, "a z-bucket leaked past its aligned Morton tile")
  }

  // --- shard planning ------------------------------------------------------

  test("shard plan: conservation, pigeonhole, and fill bounds") {
    val out = run("q_shard_plan").persist()
    try {
      val total = out.agg(sum("part_bytes")).head.getLong(0)
      val truth = spark.read.parquet(s"$dir/documents.parquet")
        .agg(sum("n_chars")).head.getLong(0)
      assert(total === truth, "grain byte totals must conserve corpus bytes")
      val bad = out.filter(
        col("n_filled") > col("n_shards") ||
          col("max_shard") < col("min_shard") ||
          // pigeonhole: the fullest shard holds at least the mean fill
          col("max_shard") * col("n_shards") < col("part_bytes") ||
          col("skew") < 1.0).count()
      assert(bad === 0)
    } finally out.unpersist()
  }

  // --- mutual kNN ----------------------------------------------------------

  test("mutual kNN: reciprocity is symmetric and bounded by the directed graph") {
    val out = run("q_mutual_knn").persist()
    try {
      val bad = out.filter(col("n_mutual") > col("n_knn") || col("n_knn") > 3 ||
        (col("n_mutual") > 0 && col("nearest_mutual") < 0) ||
        (col("n_mutual") === 0 && col("nearest_mutual") =!= -1)).count()
      assert(bad === 0)
      // every mutual edge is counted once at EACH endpoint -> even total
      val totalMutual = out.agg(sum("n_mutual")).head.getLong(0)
      assert(totalMutual % 2 === 0,
        s"mutual edge endpoint count $totalMutual must be even")
      assert(totalMutual > 0, "banded candidates should yield some mutual pairs")
    } finally out.unpersist()
  }

  // --- skyline ---------------------------------------------------------------

  test("skyline is sound and complete vs brute-force dominance") {
    import graft.queries.Tables.t
    graft.functions.GraftFunctions.register(spark)
    val d = t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars").as("x"),
        size(array_distinct(call_function("graft_ws_tokens", col("text"))))
          .cast("long").as("y"))
      .persist()
    try {
      val sky = run("q_skyline")
        .select(col("lang"), col("doc_id"),
          col("len_chars").as("x"), col("n_vocab").as("y"))
      // soundness: no survivor is dominated by ANY doc of its language
      val dominatedSurvivors = sky.as("s").join(d.as("o"),
        col("s.lang") === col("o.lang") && col("s.doc_id") =!= col("o.doc_id") &&
          col("o.x") >= col("s.x") && col("o.y") >= col("s.y") &&
          (col("o.x") > col("s.x") || col("o.y") > col("s.y")),
        "left_semi").count()
      assert(dominatedSurvivors === 0, "a dominated doc leaked onto the skyline")
      // completeness: every non-survivor IS dominated by someone
      val nonSky = d.join(sky.select("lang", "doc_id"), Seq("lang", "doc_id"),
        "left_anti")
      val undominated = nonSky.as("s").join(d.as("o"),
        col("s.lang") === col("o.lang") && col("s.doc_id") =!= col("o.doc_id") &&
          col("o.x") >= col("s.x") && col("o.y") >= col("s.y") &&
          (col("o.x") > col("s.x") || col("o.y") > col("s.y")),
        "left_anti").count()
      assert(undominated === 0, "an undominated doc was excluded from the skyline")
    } finally d.unpersist()
  }

  // --- salted aggregation ------------------------------------------------------

  test("salting is invisible: salted two-stage equals direct aggregate") {
    import graft.queries.Tables.t
    graft.functions.GraftFunctions.register(spark)
    val direct = t(spark, dir, "documents")
      .select(col("lang"), col("n_chars"),
        array_distinct(call_function("graft_ws_tokens", col("text"))).as("ts"))
      .select(col("lang"), col("n_chars"), explode(col("ts")).as("tok"))
      .groupBy("lang")
      .agg(countDistinct("tok").as("n_vocab"))
    val out = run("q_salted_agg")
    val mism = out.join(direct.withColumnRenamed("n_vocab", "d_vocab"), "lang")
      .filter(col("n_vocab") =!= col("d_vocab")).count()
    assert(mism === 0, "salted distinct count disagrees with countDistinct")
    val totals = out.agg(sum("n_docs")).head.getLong(0)
    assert(totals === t(spark, dir, "documents").count())
  }

  // --- entropy filter ----------------------------------------------------------

  test("entropy is bounded by log2(alphabet) and coherent with the pass flag") {
    val out = run("q_entropy_filter").persist()
    try {
      val bad = out.filter(col("entropy") < 0 ||
        col("entropy") > log2(col("n_alphabet").cast("double")) + 1e-4).count()
      assert(bad === 0, "Shannon entropy escaped [0, log2(|alphabet|)]")
      val incoherent = out.filter(
        (col("pass") === 1 && col("entropy") < 1.9999) ||
          (col("pass") === 0 && col("entropy") > 2.0001)).count()
      assert(incoherent === 0)
      assert(out.count() ===
        spark.read.parquet(s"$dir/documents.parquet").count())
    } finally out.unpersist()
  }

  // --- KS test ---------------------------------------------------------------

  test("KS distance matches an independent in-memory recomputation") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byLang = rows.groupBy(_._1)
    val expected = byLang.map { case (lang, a) =>
      val as = a.map(_._2)
      val bs = rows.filter(_._1 != lang).map(_._2)
      val support = (as ++ bs).distinct.sorted
      val nA = as.length.toLong
      val nB = bs.length.toLong
      val ksNum = support.map { v =>
        math.abs(as.count(_ <= v) * nB - bs.count(_ <= v) * nA)
      }.max
      lang -> (nA, nB, ksNum)
    }
    val out = run("q_ks_test").collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val (nA, nB, ksNum) = expected(r.getString(0))
      assert(r.getLong(1) === nA && r.getLong(2) === nB,
        s"${r.getString(0)}: sample sizes disagree")
      assert(r.getLong(3) === ksNum,
        s"${r.getString(0)}: KS numerator ${r.getLong(3)} != brute-force $ksNum")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  // --- Poisson bootstrap ------------------------------------------------------

  test("bootstrap CIs are ordered, complete, and cover most true means") {
    val out = run("q_bootstrap_ci").persist()
    try {
      assert(out.filter(col("n_reps") =!= 32).count() === 0)
      assert(out.filter(col("boot_lo") > col("boot_hi")).count() === 0)
      val truth = spark.read.parquet(s"$dir/documents.parquet")
        .groupBy("source").agg(avg("n_chars").as("mu"))
      // a ~93% interval per source: allow a couple of deterministic
      // misses across the 20 sources, but most must cover
      val covered = out.join(truth, "source")
        .filter(col("mu") >= col("boot_lo") && col("mu") <= col("boot_hi"))
        .count()
      assert(covered >= 15, s"only $covered/20 CIs cover the true mean")
    } finally out.unpersist()
  }

  // --- epoch shuffle -----------------------------------------------------------

  test("epoch shuffle conserves docs, mixes batches, and varies across epochs") {
    val out = run("q_epoch_shuffle").persist()
    try {
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      val perEpoch = out.groupBy("epoch").agg(sum("n_docs").as("n")).collect()
      assert(perEpoch.length === 4)
      perEpoch.foreach(r => assert(r.getLong(1) === nDocs,
        s"epoch ${r.getLong(0)} lost documents"))
      // mixing: every FULL batch of 64 should see several languages —
      // a sorted-by-lang layout would give 1
      val poorMix = out.filter(col("n_docs") === 64 && col("n_langs") < 3).count()
      assert(poorMix === 0, "a full shuffled batch saw < 3 languages")
      // epochs must actually differ: batch_chars profiles of epoch 0 and 1
      val e0 = out.filter(col("epoch") === 0).select("batch", "batch_chars")
      val e1 = out.filter(col("epoch") === 1)
        .select(col("batch"), col("batch_chars").as("bc1"))
      val same = e0.join(e1, "batch")
        .filter(col("batch_chars") === col("bc1")).count()
      val total = e0.count()
      assert(same < total, "epoch 0 and epoch 1 produced identical batches")
    } finally out.unpersist()
  }

  // --- incremental dedup --------------------------------------------------------

  test("incremental dedup: history wins, canonicals are survivors, idempotent") {
    val out = run("q_incr_dedup").persist()
    try {
      // dup_history canonicals point INTO history
      assert(out.filter(col("status") === "dup_history" &&
        col("canonical_id") >= 250).count() === 0)
      // new docs are their own canonical
      assert(out.filter(col("status") === "new" &&
        col("canonical_id") =!= col("doc_id")).count() === 0)
      // a dup_delta's canonical is a delta doc that was judged NEW
      // (if its key were in history the whole group would be dup_history)
      val canonStatus = out.select(col("doc_id").as("canonical_id"),
        col("status").as("c_status"))
      val badChain = out.filter(col("status") === "dup_delta")
        .join(canonStatus, "canonical_id")
        .filter(col("c_status") =!= "new").count()
      assert(badChain === 0, "a dup_delta canonical is not a surviving 'new' doc")
      // the planted payload groups force all three statuses to appear
      val statuses = out.select("status").distinct().collect().map(_.getString(0)).toSet
      assert(statuses === Set("dup_history", "dup_delta", "new"))
    } finally out.unpersist()
  }

  // --- weighted reservoir -----------------------------------------------------

  test("reservoir sample matches an in-memory Efraimidis-Spirakis recompute") {
    import java.security.MessageDigest
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def u32(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map { case (_, id, w) =>
        (src, id, math.log((u32(id) + 1).toDouble / 4294967296.0) / w.toDouble)
      }.sortBy { case (_, id, key) => (-key, id) }
        .take(5).zipWithIndex
        .map { case ((s, id, _), i) => (s, i + 1L, id) }
    }.toSet
    val got = run("q_reservoir_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected, "A-ES reservoir disagrees with in-memory recompute")
  }

  // --- rendezvous hashing ------------------------------------------------------

  test("HRW growth moves only to the new shard, roughly 1/9 of keys") {
    val out = run("q_rendezvous").persist()
    try {
      val n = out.agg(sum("n_docs")).head.getLong(0)
      val moved = out.agg(sum("n_moved")).head.getLong(0)
      // expected move fraction is 1/(S+1) = 1/9 ≈ 0.111
      val frac = moved.toDouble / n
      assert(frac > 0.04 && frac < 0.25, s"moved fraction $frac far from 1/9")
      // the minimal-movement invariant: rebuild per-doc assignments and
      // confirm every moved key's NEW home is the added shard (8)
      import java.security.MessageDigest
      def h14(id: Long, s: Int): Long = {
        val hex = MessageDigest.getInstance("MD5")
          .digest(s"${id}_$s".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 14)
        java.lang.Long.parseLong(hex, 16)
      }
      val ids = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").collect().map(_.getLong(0))
      var movedCheck = 0L
      ids.foreach { id =>
        val aOld = (0 until 8).maxBy(s => h14(id, s) * 16 + s)
        val aNew = (0 until 9).maxBy(s => h14(id, s) * 16 + s)
        if (aNew != aOld) {
          movedCheck += 1
          assert(aNew === 8, s"doc $id moved between OLD shards $aOld -> $aNew")
        }
      }
      assert(movedCheck === moved, "aggregate n_moved disagrees with per-doc truth")
    } finally out.unpersist()
  }

  // --- interval coverage -------------------------------------------------------

  test("interval-union coverage matches an in-memory sweep merge") {
    val evs = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).map { case (uid, rows) =>
      val iv = rows.map { case (_, eid, st) => (st, st + (eid % 7 + 1) * 60) }
        .sortBy(identity)
      var covered = 0L; var islands = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      iv.foreach { case (s0, e0) =>
        if (curE == Long.MinValue || s0 > curE) {
          if (curE != Long.MinValue) covered += curE - curS
          islands += 1; curS = s0; curE = e0
        } else curE = math.max(curE, e0)
      }
      covered += curE - curS
      uid -> (rows.length.toLong, islands, covered)
    }
    val got = run("q_interval_cover").collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nEv, nIsl, cov) = expected(r.getLong(0))
      assert(r.getLong(1) === nEv)
      assert(r.getLong(2) === nIsl,
        s"user ${r.getLong(0)}: islands ${r.getLong(2)} != sweep $nIsl")
      assert(r.getLong(3) === cov,
        s"user ${r.getLong(0)}: coverage ${r.getLong(3)} != sweep $cov")
      assert(r.getLong(3) <= r.getLong(4), "covered cannot exceed span")
    }
  }

  // --- chi-square ---------------------------------------------------------------

  test("chi-square matches an in-memory contingency recompute") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val rr = rows.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val cc = rows.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val cells = rows.groupBy(identity).view.mapValues(_.length.toDouble)
    // same closed form as the query: sum over observed + n
    val tsum = cells.map { case ((l, s0), o) =>
      val e = rr(l) * cc(s0) / n
      math.floor(((o - e) * (o - e) / e - e) * 1e6 + 0.5).toLong
    }.sum
    val chi2 = math.floor((tsum / 1e6 + n) * 1e4 + 0.5) / 1e4
    val out = run("q_chi_square").head
    assert(out.getLong(1) === (rr.size - 1).toLong * (cc.size - 1))
    assert(out.getDouble(2) === chi2,
      s"chi2 ${out.getDouble(2)} != recompute $chi2")
    assert(out.getDouble(3) >= 0.0 && out.getDouble(3) <= 1.0,
      "Cramér's V out of [0, 1]")
  }

  // --- Mann-Whitney -----------------------------------------------------------

  test("Mann-Whitney U matches an in-memory tie-averaged rank recompute") {
    val vals = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("source").isin("src1", "src2"))
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sorted = vals.map(_._2).sorted
    // 2x tie-averaged rank per value
    val rank2 = sorted.distinct.map { v =>
      val below = sorted.count(_ < v)
      val ties = sorted.count(_ == v)
      v -> (2L * below + ties + 1)
    }.toMap
    val n1 = vals.count(_._1 == "src1").toLong
    val n2 = vals.count(_._1 == "src2").toLong
    val r1x2 = vals.filter(_._1 == "src1").map(v => rank2(v._2)).sum
    val u2 = r1x2 - n1 * (n1 + 1)
    val out = run("q_mann_whitney").head
    assert(out.getLong(0) === n1 && out.getLong(1) === n2)
    assert(out.getLong(2) === u2, s"2U ${out.getLong(2)} != recompute $u2")
    assert(out.getDouble(3) >= 0.0 && out.getDouble(3) <= 1.0,
      "rank-sum AUC out of [0, 1]")
  }

  // --- Gini / concentration -----------------------------------------------------

  test("concentration report matches an in-memory recompute") {
    val xs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source").agg(sum("n_chars").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = xs.length.toLong
    val total = xs.map(_._2).sum
    val asc = xs.sortBy(t => (t._2, t._1))
    val sxi = asc.zipWithIndex.map { case ((_, x), i) => (i + 1L) * x }.sum
    val gini = math.floor((2.0 * sxi / (n * total).toDouble -
      (n + 1).toDouble / n.toDouble) * 1e4 + 0.5) / 1e4
    val k = math.max(1L, math.ceil(n / 10.0).toLong)
    val topShare = math.floor(
      (xs.sortBy(t => (-t._2, t._1)).take(k.toInt).map(_._2).sum /
        total.toDouble) * 1e4 + 0.5) / 1e4
    val out = run("q_gini").head
    assert(out.getLong(0) === n && out.getLong(1) === total)
    assert(out.getDouble(2) === gini, s"gini ${out.getDouble(2)} != $gini")
    assert(out.getDouble(3) === topShare)
    // HHI bounds: 1/n (uniform) .. 1 (monopoly)
    assert(out.getDouble(4) >= 1.0 / n - 1e-4 && out.getDouble(4) <= 1.0)
  }

  // --- CUSUM ----------------------------------------------------------------------

  test("CUSUM peak matches an in-memory scan") {
    val daily = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val total = daily.map(_._2).sum
    var cusum = 0L; var best = -1L; var bestDay = ""
    daily.foreach { case (d, c) =>
      cusum += c * n - total
      if (math.abs(cusum) > best) { best = math.abs(cusum); bestDay = d }
    }
    val out = run("q_cusum").head
    assert(out.getLong(0) === n && out.getLong(1) === total)
    assert(out.getString(2) === bestDay,
      s"peak day ${out.getString(2)} != scan $bestDay")
    assert(out.getLong(3) === best)
  }

  // --- source overlap ---------------------------------------------------------------

  test("source-overlap matrix: full pair coverage, bounds, one pair recomputed") {
    graft.functions.GraftFunctions.register(spark)
    val out = run("q_source_overlap").persist()
    try {
      val nSrc = spark.read.parquet(s"$dir/documents.parquet")
        .select("source").distinct().count()
      assert(out.count() === nSrc * (nSrc - 1) / 2, "missing source pairs")
      assert(out.filter(col("inter") > col("uni") ||
        col("jaccard") <= 0 || col("jaccard") > 1).count() === 0)
      // recompute one pair in memory
      def vocab(src: String): Set[String] = spark.read
        .parquet(s"$dir/documents.parquet")
        .filter(col("source") === src)
        .select(explode(call_function("graft_ws_tokens", col("text"))).as("t"))
        .distinct().collect().map(_.getString(0)).toSet
      val (va, vb) = (vocab("src1"), vocab("src2"))
      val r = out.filter(col("src_a") === "src1" && col("src_b") === "src2").head
      assert(r.getLong(2) === va.intersect(vb).size.toLong)
      assert(r.getLong(3) === va.union(vb).size.toLong)
    } finally out.unpersist()
  }

  // --- decay weighting -----------------------------------------------------------------

  test("decay-weighted mean stays in the per-user value envelope, eff_n <= n") {
    val out = run("q_decay_weighted").persist()
    try {
      assert(out.filter(col("eff_n") > col("n_events").cast("double") + 1e-6)
        .count() === 0, "effective n exceeded event count (w must be <= 1)")
      val env = spark.read.parquet(s"$dir/events.parquet")
        .groupBy("user_id")
        .agg(min("value").as("lo"), max("value").as("hi"))
      val escaped = out.join(env, "user_id")
        .filter(col("decayed_mean") < col("lo") - 1e-3 ||
          col("decayed_mean") > col("hi") + 1e-3).count()
      assert(escaped === 0, "a weighted mean escaped [min, max] of its values")
    } finally out.unpersist()
  }

  // --- DP noise -------------------------------------------------------------------

  test("Laplace release perturbs every count within plausible eps=1 bounds") {
    val out = run("q_dp_noise").persist()
    try {
      val rows = out.collect()
      rows.foreach { r =>
        val diff = math.abs(r.getDouble(2) - r.getLong(1))
        assert(diff > 0.0, s"${r.getString(0)}: noise was exactly zero")
        // Laplace(b=1): P(|X| > 15) = e^-15 — any larger value means the
        // inverse-CDF arithmetic broke
        assert(diff < 15.0, s"${r.getString(0)}: implausible noise $diff")
      }
    } finally out.unpersist()
  }

  // --- k-anonymity ------------------------------------------------------------------

  test("k-anonymity audit agrees with a direct QI group recount") {
    val out = run("q_kanon").persist()
    try {
      assert(out.filter(col("n_small_groups") > col("n_groups") ||
        col("min_group") < 1 ||
        col("exposed_frac") < 0 || col("exposed_frac") > 1).count() === 0)
      val truth = spark.read.parquet(s"$dir/documents.parquet")
        .groupBy(col("lang"), col("source"), expr("n_chars div 100"))
        .agg(count(lit(1)).as("gsz"))
        .groupBy("lang")
        .agg(sum(when(col("gsz") < 5, col("gsz")).otherwise(0L)).as("t_exposed"))
      val mism = out.join(truth, "lang")
        .filter(col("n_exposed") =!= col("t_exposed")).count()
      assert(mism === 0, "exposed-row count disagrees with direct recount")
    } finally out.unpersist()
  }

  // --- MAD outliers ---------------------------------------------------------------

  test("MAD outlier audit matches an in-memory lower-median recompute") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply(((xs.size + 1) / 2) - 1)
    val expected = rows.groupBy(_._1).map { case (lang, vs0) =>
      val vs = vs0.map(_._2).toSeq
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      val outs = vs.count(v => math.abs(v - med) > 3 * mad).toLong
      lang -> (vs.size.toLong, med, mad, outs)
    }
    val got = run("q_mad_outliers").collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, med, mad, outs) = expected(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === med &&
        r.getLong(3) === mad && r.getLong(4) === outs,
        s"${r.getString(0)}: (n, med, mad, outliers) disagree with recompute")
    }
  }

  // --- clustering evaluation -------------------------------------------------------

  test("cluster eval pair counts match a brute-force O(n^2) recompute") {
    // the query computes TP/FP/FN/Rand from contingency-cell closed forms;
    // the ground truth here is literal pair enumeration over all C(n,2)
    // (vec_id, vec_id) pairs — feasible at sf0.001, impossible at scale,
    // which is exactly why the closed form exists
    val assign = graft.queries.TrainingDataQueries.bandSigs(spark, dir)
      .filter(col("band") === 0)
      .select(col("vec_id"), col("sig").as("cluster"))
      .join(spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("label")), "vec_id")
      .collect().map(r => (r.get(1), r.getInt(2)))
    var tp = 0L; var fp = 0L; var fn = 0L; var tn = 0L
    for (i <- assign.indices; j <- (i + 1) until assign.length) {
      val sameC = assign(i)._1 == assign(j)._1
      val sameT = assign(i)._2 == assign(j)._2
      if (sameC && sameT) tp += 1
      else if (sameC) fp += 1
      else if (sameT) fn += 1
      else tn += 1
    }
    val r = run("q_cluster_eval").collect().head
    assert(r.getAs[Long]("n") === assign.length.toLong)
    assert(r.getAs[Long]("tp") === tp, "TP disagrees with pair enumeration")
    assert(r.getAs[Long]("fp") === fp, "FP disagrees with pair enumeration")
    assert(r.getAs[Long]("fn") === fn, "FN disagrees with pair enumeration")
    val rand = (tp + tn).toDouble / (tp + tn + fp + fn).toDouble
    assert(math.abs(r.getAs[Double]("rand_index") - rand) < 1e-3)
    // purity: fraction of vectors whose cluster's majority label is theirs
    val purity = assign.groupBy(_._1).values
      .map(vs => vs.groupBy(_._2).values.map(_.size).max).sum.toDouble /
      assign.length
    assert(math.abs(r.getAs[Double]("purity") - purity) < 1e-3)
  }

  // --- grouped split ---------------------------------------------------------------

  test("grouped split: no user straddles splits; per-split counts match a recompute") {
    import java.security.MessageDigest
    def split(uid: Long): String = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val b = java.lang.Long.parseLong(hex, 16) % 100
      if (b < 90) "train" else if (b < 95) "val" else "test"
    }
    val users = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").collect().map(_.getLong(0))
    val expected = users.groupBy(split).map { case (s, us) =>
      s -> (us.distinct.length.toLong, us.length.toLong)
    }
    val got = run("q_group_split").collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (nu, ne) = expected(r.getString(0))
      assert(r.getAs[Long]("n_users") === nu &&
        r.getAs[Long]("n_events") === ne,
        s"${r.getString(0)}: counts disagree with an independent md5 recompute")
      assert(r.getAs[Long]("max_splits_per_user") === 1L,
        "a group landed in two splits — leakage")
    }
  }

  // --- DP heavy-hitter release -----------------------------------------------------

  test("DP top-k release equals an in-memory mechanism recompute") {
    val eps = 1.0
    val tau = 1.0 + 2.0 * math.log(500000.0) / eps
    import java.security.MessageDigest
    def md5hex8(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
    val df = docs.flatMap { r =>
      r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty).distinct.map(t => (t, r.getLong(0)))
    }.groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val expected = df.flatMap { case (tok, n) =>
      val u = (md5hex8(tok) + 0.5) / 4294967296.0
      val noise = -(1.0 / eps) * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      val noisy = math.floor((n + noise) * 1e4 + 0.5) / 1e4
      if (noisy > tau) Some(tok -> (n, noisy)) else None
    }
    val got = run("q_dp_topk").collect()
    assert(got.length === expected.size,
      "released-token set differs from the mechanism recompute")
    got.foreach { r =>
      val (n, noisy) = expected(r.getString(0))
      assert(r.getAs[Long]("n_true") === n)
      assert(math.abs(r.getAs[Double]("n_noisy") - noisy) < 1e-9)
    }
    // the stability guarantee: nothing below the threshold leaks
    assert(got.forall(_.getAs[Double]("n_noisy") > tau))
  }

  // --- label propagation -------------------------------------------------------

  test("label propagation matches a two-round in-memory majority-vote recompute") {
    val sigs = graft.queries.TrainingDataQueries.bandSigs(spark, dir)
      .select("vec_id", "band", "sig").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.get(2))))
    // candidate edges = band-signature agreement, symmetric, deduped
    val byBucket = sigs.groupBy(_._2).values
    val ed = byBucket.flatMap { vs =>
      val ids = vs.map(_._1).distinct.toList
      for (a <- ids; b <- ids if a != b) yield (a, b)
    }.toSet
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val seeds = labels.filter { case (id, _) => id % 3 == 0 }
    def propagate(labeled: Map[Long, Long]): Map[Long, Long] =
      ed.filter { case (u, v) => !labeled.contains(u) && labeled.contains(v) }
        .groupBy(_._1).map { case (u, es) =>
          val votes = es.toSeq.map(e => labeled(e._2))
            .groupBy(identity).map { case (l, xs) => (l, xs.size) }
          u -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
    val r1 = propagate(seeds)
    val r2 = propagate(seeds ++ r1)
    def counts(m: Map[Long, Long]): Map[Long, Long] =
      m.values.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val (cs, c1, c2) = (counts(seeds), counts(r1), counts(r2))
    val got = run("q_label_prop").collect()
    got.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) === cs.getOrElse(l, 0L), s"label $l seeds")
      assert(r.getLong(2) === c1.getOrElse(l, 0L), s"label $l round1")
      assert(r.getLong(3) === c2.getOrElse(l, 0L), s"label $l round2")
    }
    // rounds only grow the labeled set: no vec revotes
    assert(r1.keySet.intersect(seeds.keySet).isEmpty)
    assert(r2.keySet.intersect((seeds ++ r1).keySet).isEmpty)
    assert(r1.nonEmpty, "round 1 propagated nothing — graph too sparse for the test")
  }

  // --- conformal gating --------------------------------------------------------

  test("conformal threshold and rates match an exact in-memory recompute") {
    import java.security.MessageDigest
    def md5hex8(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    val scored = graft.queries.CurationQueries.probeScores(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (cal, test) = scored.partition { case (id, _, _) =>
      md5hex8(id.toString) % 100 < 50 }
    val calNeg = cal.filter(_._2 == 0L)
    val k = (10 * (calNeg.length + 1)) / 100
    assert(k >= 1, "calibration negatives too few for the alpha")
    // k-th largest score, ties by doc_id (same convention as the query)
    val thresh = calNeg.sortBy { case (id, _, sc) => (-sc, id) }.apply(k - 1)._3
    val testNeg = test.count(_._2 == 0L)
    val testPos = test.count(_._2 == 1L)
    val fp = test.count { case (_, y, sc) => y == 0L && sc > thresh }
    val tp = test.count { case (_, y, sc) => y == 1L && sc > thresh }
    val r = run("q_conformal").collect().head
    assert(r.getAs[Long]("n_cal_neg") === calNeg.length.toLong)
    assert(r.getAs[Long]("thresh") === thresh)
    assert(r.getAs[Long]("fp") === fp.toLong &&
      r.getAs[Long]("tp") === tp.toLong)
    assert(r.getAs[Long]("fpr_micros") === 1000000L * fp / testNeg)
    assert(r.getAs[Long]("tpr_micros") === 1000000L * tp / testPos)
    // the finite-sample promise this threshold exists for: the realized
    // test FPR sits at/below alpha plus binomial noise (4 sigma)
    val alpha = 0.10
    val slack = 4.0 * math.sqrt(alpha * (1 - alpha) / testNeg)
    assert(fp.toDouble / testNeg <= alpha + slack,
      s"test FPR ${fp.toDouble / testNeg} blows the conformal bound")
  }

  // --- AMS F2 sketch -----------------------------------------------------------

  test("ams sketch: exact F2, all 16 counters, and the median pick match " +
    "an independent JVM recompute from the term table") {
    import java.security.MessageDigest
    def md5sid7(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7), 16)
    graft.functions.GraftFunctions.register(spark)
    // term table through the battery's own tokenizer (parity-tested
    // elsewhere); the AMS math is recomputed here independently
    val tf = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(call_function("graft_ws_tokens", col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val f2Exact = tf.map { case (_, c) => c * c }.sum
    val f1 = tf.map(_._2).sum
    val counters = (0 until 16).map { sk =>
      sk -> tf.map { case (tok, c) =>
        ((md5sid7(s"$tok:$sk") % 2) * 2 - 1) * c
      }.sum
    }
    val f2Est = counters.map { case (sk, c) => (c * c, sk) }
      .sorted.apply(7)._1 // lower median = rank 8 of 16
    val r = run("q_ams_sketch").collect().head
    assert(r.getAs[Long]("n_terms") === tf.length.toLong)
    assert(r.getAs[Long]("f1") === f1)
    assert(r.getAs[Long]("f2_exact") === f2Exact)
    assert(r.getAs[Long]("f2_est") === f2Est)
    assert(r.getAs[Long]("err_ppm") ===
      math.floor(math.abs(f2Est - f2Exact).toDouble * 1e6 / f2Exact).toLong)
  }

  // --- Benford audit -----------------------------------------------------------

  test("benford: digits complete, shares sum to ~1e9, counts match a recount") {
    val out = run("q_benford").collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq === (1 to 9))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).filter(_ > 0)
    val byDigit = docs.groupBy(n => n.toString.head.asDigit)
      .map { case (d, xs) => d -> xs.length.toLong }
    out.foreach { r =>
      assert(r.getAs[Long]("n_obs") ===
        byDigit.getOrElse(r.getAs[Int]("digit"), 0L))
    }
    assert(out.map(_.getAs[Long]("n_obs")).sum === docs.length.toLong)
    // integer-floor shares: within 9 ppb of unity from below
    val shareSum = out.map(_.getAs[Long]("share_ppb")).sum
    assert(shareSum > 1000000000L - 9 && shareSum <= 1000000000L)
  }

  // --- largest-remainder quota allocation ---------------------------------------

  test("quota allocation: totals exactly the budget, every stratum within 1 " +
    "of its real quota, winners are the largest remainders") {
    val out = run("q_quota_alloc").collect()
    val b = 1000L
    assert(out.map(_.getAs[Long]("alloc")).sum === b,
      "largest-remainder must hit the budget exactly")
    val n = out.map(_.getAs[Long]("n_docs")).sum
    out.foreach { r =>
      val quota = r.getAs[Long]("n_docs").toDouble * b / n
      val alloc = r.getAs[Long]("alloc").toDouble
      assert(math.abs(alloc - quota) < 1.0,
        s"stratum ${r.getAs[String]("lang")}/${r.getAs[String]("source")} " +
          s"alloc $alloc vs quota $quota breaks the Hamilton ±1 property")
      assert(r.getAs[Long]("alloc") - r.getAs[Long]("base") <= 1L)
    }
    // every promoted stratum has remainder >= every unpromoted one
    val promoted = out.filter(r => r.getAs[Long]("alloc") > r.getAs[Long]("base"))
    val skipped = out.filter(r => r.getAs[Long]("alloc") === r.getAs[Long]("base"))
    if (promoted.nonEmpty && skipped.nonEmpty)
      assert(promoted.map(_.getAs[Long]("rem")).min >=
        skipped.map(_.getAs[Long]("rem")).max)
  }

  // --- Borůvka minimum spanning forest ------------------------------------------

  test("boruvka rounds match an in-memory union-find replay and select only " +
    "true MST edges") {
    graft.functions.GraftFunctions.register(spark)
    // the query's own candidate-edge construction, collected
    val sigs = graft.queries.TrainingDataQueries.bandSigs(spark, dir)
    val edges = sigs.select(col("vec_id").as("id_a"), col("e").as("ea"),
        col("band"), col("sig"))
      .join(sigs.select(col("vec_id").as("id_b"), col("e").as("eb"),
        col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first("ea").as("ea"), first("eb").as("eb"))
      .withColumn("dist", expr("graft_l2q(ea, eb)"))
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(edges.nonEmpty, "LSH candidate graph is empty — test data too sparse")
    // deterministic total order on edges
    val ord = Ordering.by[(Long, Long, Long), (Long, Long, Long)] {
      case (a, b, d) => (d, a, b) }
    // union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    // Kruskal MST under the same total order (unique because the order is total)
    val mst = scala.collection.mutable.Set[(Long, Long)]()
    edges.sorted(ord).foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; mst += ((a, b)) }
    }
    // Borůvka replay with min-label contraction (the query's convention)
    var label = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> n).toMap
    val expected = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long, Long)]()
    val allSelected = scala.collection.mutable.Set[(Long, Long)]()
    for (r <- 1 to 2) {
      val cross = edges.filter(e => label(e._1) != label(e._2))
      val byComp = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      cross.foreach { case e @ (a, b, _) =>
        Seq(label(a), label(b)).foreach { c =>
          if (!byComp.contains(c) || ord.lt(e, byComp(c))) byComp(c) = e
        }
      }
      val sel = byComp.values.toSet
      val nBefore = label.values.toSet.size.toLong
      // contract: min label over components of the selected label graph
      val adj = scala.collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
      sel.foreach { case (a, b, _) =>
        val (la, lb) = (label(a), label(b))
        adj(la) += lb; adj(lb) += la
      }
      val newLab = scala.collection.mutable.Map[Long, Long]()
      adj.keys.toSeq.sorted.foreach { start =>
        if (!newLab.contains(start)) {
          val comp = scala.collection.mutable.Set[Long]()
          val stack = scala.collection.mutable.Stack(start)
          while (stack.nonEmpty) {
            val x = stack.pop()
            if (!comp(x)) { comp += x; adj(x).foreach(stack.push) }
          }
          val m = comp.min
          comp.foreach(newLab(_) = m)
        }
      }
      label = label.map { case (n, l) => n -> newLab.getOrElse(l, l) }
      expected += ((r, nBefore, sel.size.toLong, sel.map(_._3).sum,
        label.values.toSet.size.toLong))
      sel.foreach { case (a, b, _) => allSelected += ((a, b)) }
    }
    // every Borůvka selection is a true MST edge (distinct total order ⇒
    // the classic cut-property guarantee)
    assert(allSelected.subsetOf(mst.toSet),
      s"selected non-MST edges: ${allSelected.diff(mst.toSet).take(5)}")
    val out = run("q_boruvka_mst").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq === expected.toSeq)
    // rounds make progress: components strictly decrease while edges remain
    out.foreach { case (_, before, nSel, _, after) =>
      if (nSel > 0) assert(after < before)
    }
  }

  // --- greedy maximum coverage ---------------------------------------------------

  test("max-cover greedy matches an in-memory replay; gains are monotone " +
    "non-increasing and telescope into the coverage curve") {
    graft.functions.GraftFunctions.register(spark)
    val docToks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr("graft_shingles(text)").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    var covered = Set.empty[String]
    var chosen = Vector.empty[(Int, Long, Long)]
    var saturated = false
    for (r <- 1 to 5 if !saturated) {
      val gains = docToks.view
        .filterKeys(d => !chosen.exists(_._2 == d)).toMap
        .map { case (d, ts) => d -> (ts -- covered).size.toLong }
        .filter(_._2 > 0) // zero-gain docs vanish from the anti-joined agg
      if (gains.isEmpty) saturated = true
      else {
        val (doc, gain) = gains.minBy { case (d, g) => (-g, d) }
        covered ++= docToks(doc)
        chosen :+= ((r, doc, gain))
      }
    }
    assert(chosen.length === 5,
      "bigram universe saturated early — universe too small for the test")
    val out = run("q_max_cover").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(t => (t._1, t._2, t._3)).toVector === chosen)
    // telescoping: cum_cover at rank r = |union of first r docs' vocab|
    var cum = Set.empty[String]
    out.foreach { case (_, doc, _, cc) =>
      cum ++= docToks(doc)
      assert(cc === cum.size.toLong)
    }
    // greedy marginal gains never increase (submodularity)
    assert(out.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  // --- Theil–Sen robust slope ---------------------------------------------------

  test("theil-sen slope and intercept match an exact in-memory recompute " +
    "on the same deterministic sample") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(call_function("graft_ws_tokens", col("text"))))
          .cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sample = docs.sortBy { case (id, _, _) => (md5hex(id.toString), id) }.take(64)
    val pairs = for {
      (ia, xa, ya) <- sample; (ib, xb, yb) <- sample
      if ia < ib && xa != xb
    } yield (ia, ib, (yb - ya) * 1000000L / (xb - xa))
    val slope = pairs.sortBy { case (a, b, sp) => (sp, a, b) }
      .apply((pairs.length + 1) / 2 - 1)._3
    val intercept = sample.map { case (id, x, y) => (y * 1000000L - slope * x, id) }
      .sorted.apply((64 + 1) / 2 - 1)._1
    val r = run("q_theil_sen").collect().head
    assert(r.getAs[Long]("n_sample") === 64L)
    assert(r.getAs[Long]("n_pairs") === pairs.length.toLong)
    assert(r.getAs[Long]("slope_ppm") === slope)
    assert(r.getAs[Long]("intercept_fp") === intercept)
  }

  // --- histogram quantiles --------------------------------------------------------

  test("histogram quantiles: exact side matches a rank-pick recompute and the " +
    "sketch error honors the one-bucket-width bound") {
    val xs = spark.read.parquet(s"$dir/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0)).sorted
    val n = xs.length
    val out = run("q_hist_quantiles").collect()
    assert(out.map(_.getAs[Long]("q")).toSeq === Seq(50L, 90L, 99L))
    out.foreach { r =>
      val q = r.getAs[Long]("q")
      val rank = (q * n + 99) / 100 // ceil(q*n/100)
      assert(r.getAs[Long]("n") === n.toLong)
      assert(r.getAs[Long]("exact") === xs((rank - 1).toInt))
      assert(r.getAs[Long]("err") <= r.getAs[Long]("max_err"),
        s"q=$q sketch error ${r.getAs[Long]("err")} exceeds the bucket-width " +
          s"bound ${r.getAs[Long]("max_err")}")
    }
  }

  // --- priority sampling ------------------------------------------------------------

  test("priority sample: tau, kept set, and the subset-sum estimator match an " +
    "exact in-memory recompute") {
    import java.security.MessageDigest
    def h20(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 5), 16)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val prio = docs.map { case (id, w) => (id, w, w * 1048576L / (h20(id.toString) + 1)) }
    val sorted = prio.sortBy { case (id, _, p) => (-p, id) }
    val tau = sorted(32)._3
    val wEst = sorted.take(32).map { case (_, w, _) => math.max(w, tau) }.sum
    val wTotal = docs.map(_._2).sum
    val r = run("q_priority_sample").collect().head
    assert(r.getAs[Long]("k") === 32L)
    assert(r.getAs[Long]("tau") === tau)
    assert(r.getAs[Long]("w_total") === wTotal)
    assert(r.getAs[Long]("w_est") === wEst)
    // DLT unbiasedness: one draw won't be exact, but a 32-of-500 priority
    // sample estimating the TOTAL should land within half of the truth
    assert(math.abs(wEst - wTotal).toDouble / wTotal < 0.5,
      s"estimator $wEst wildly off total $wTotal — priority math is broken")
  }

  // --- join-key skew report -----------------------------------------------------

  test("skew report: bins partition the key table, shares telescope, hottest " +
    "bin carries the corpus-stopword mass") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(call_function("graft_ws_tokens", col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = run("q_skew_report").collect()
    // bins partition: key and row totals reconcile exactly
    assert(out.map(_.getAs[Long]("n_keys")).sum === df.length.toLong)
    assert(out.map(_.getAs[Long]("rows")).sum === df.map(_._2).sum)
    // every key lands in the bit-length bin
    val byBin = df.groupBy { case (_, d) => 63 - java.lang.Long.numberOfLeadingZeros(d) }
    out.foreach { r =>
      val b = r.getAs[Long]("bin").toInt
      assert(r.getAs[Long]("n_keys") === byBin(b).length.toLong)
      assert(r.getAs[Long]("max_df") === byBin(b).map(_._2).max)
    }
    // floor-division shares stay within one ppm per bin of unity
    val shares = out.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - out.length && shares <= 1000000L)
  }

  // --- Gini decision stump --------------------------------------------------------

  test("gini stump matches an exhaustive in-memory split search and beats " +
    "the parent impurity") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("n_chars"), col("lang")).collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "en") 1L else 0L))
    val (mn, mx, n, pos) =
      (d.map(_._1).min, d.map(_._1).max, d.length.toLong, d.map(_._2).sum)
    val binOf = (x: Long) => (x - mn) * 32L / (mx - mn + 1)
    val cand = (0L until 32L).map { b =>
      val thr = mn + (b + 1) * (mx - mn + 1) / 32L - 1
      val left = d.filter { case (x, _) => binOf(x) <= b }
      val nl = left.length.toLong
      val pl = left.map(_._2).sum
      (thr, nl, pl)
    }.filter { case (_, nl, _) => nl > 0 && nl < n }
    val scored = cand.map { case (thr, nl, pl) =>
      val (nr, pr) = (n - nl, pos - pl)
      val purity = (pl * pl + (nl - pl) * (nl - pl)) * 1000000000L / nl +
        (pr * pr + (nr - pr) * (nr - pr)) * 1000000000L / nr
      (thr, nl, pl, nr, pr, purity)
    }
    val best = scored.minBy { case (thr, _, _, _, _, p) => (-p, thr) }
    val r = run("q_gini_stump").collect().head
    assert(r.getAs[Long]("thr") === best._1)
    assert((r.getAs[Long]("nl"), r.getAs[Long]("pl"),
      r.getAs[Long]("nr"), r.getAs[Long]("pr")) === ((best._2, best._3, best._4, best._5)))
    assert(r.getAs[Long]("purity_fp") === best._6)
    // the chosen split is at least as pure as no split (Gini never hurts)
    val parent = (pos * pos + (n - pos) * (n - pos)) * 1000000000L / n
    assert(r.getAs[Long]("parent_fp") === parent)
    // purity_fp is the two-child sum at 1e9 scale; each child contributes
    // at least its share of the parent purity (concavity of Gini)
    assert(r.getAs[Long]("acc_ppm") >= 1000000L *
      math.max(pos, n - pos) / n - 1,
      "majority stump must be no worse than the majority-class baseline")
  }

  // --- Stupid Backoff LM ----------------------------------------------------------

  test("stupid backoff scores match an exact in-memory recompute and the " +
    "backoff levels actually fire on held-out trigrams") {
    import java.security.MessageDigest
    def md5hex8(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8), 16)
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), call_function("graft_ws_tokens", col("text")).as("ts"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toVector))
      .filter(_._2.length >= 3)
    val (train, test) = docs.partition { case (id, _) => md5hex8(id.toString) % 100 < 80 }
    def tris(ts: Vector[String]) = ts.sliding(3).map(w => (w(0), w(1), w(2))).toVector
    val trainTris = train.flatMap { case (_, ts) => tris(ts) }
    val c123 = trainTris.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c12 = trainTris.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.length.toLong }
    val c23 = trainTris.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.length.toLong }
    val c2 = trainTris.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val c3 = trainTris.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val tT = trainTris.length.toLong
    val expected = test.map { case (id, ts) =>
      val scores = tris(ts).map { tri =>
        if (c123.getOrElse(tri, 0L) > 0)
          (c123(tri) * 1000000L / c12((tri._1, tri._2)), 3)
        else if (c23.getOrElse((tri._2, tri._3), 0L) > 0)
          (2 * (c23((tri._2, tri._3)) * 1000000L / c2(tri._2)) / 5, 2)
        else if (c3.getOrElse(tri._3, 0L) > 0)
          (4 * (c3(tri._3) * 1000000L / tT) / 25, 1)
        else (0L, 0)
      }
      id -> (scores.length.toLong, scores.map(_._1).sum,
        scores.count(_._2 == 3).toLong, scores.count(_._2 == 2).toLong,
        scores.count(_._2 <= 1).toLong)
    }.toMap
    val out = run("q_stupid_backoff").collect()
    assert(out.length === expected.size)
    out.foreach { r =>
      val e = expected(r.getAs[Long]("doc_id"))
      assert((r.getAs[Long]("n_pos"), r.getAs[Long]("score_fp"),
        r.getAs[Long]("n_tri"), r.getAs[Long]("n_bi"),
        r.getAs[Long]("n_uni_or_oov")) === e)
    }
    // held-out scoring must exercise the backoff chain, not just the
    // trigram hit path
    assert(out.map(_.getAs[Long]("n_bi")).sum +
      out.map(_.getAs[Long]("n_uni_or_oov")).sum > 0,
      "no position ever backed off — the train/test split is not separating")
    assert(out.map(_.getAs[Long]("n_tri")).sum > 0,
      "no trigram hits at all — the split left no shared context")
  }

  // --- snapshot diff ----------------------------------------------------------------

  test("snapshot diff statuses match a direct recount of the derived versions") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val added = ids.count(i => i % 7 == 0 && i % 5 != 0).toLong
    val removed = ids.count(i => i % 7 != 0 && i % 5 == 0).toLong
    val changed = ids.count(i => i % 7 != 0 && i % 5 != 0 && i % 11 == 0).toLong
    val unchanged = ids.count(i => i % 7 != 0 && i % 5 != 0 && i % 11 != 0).toLong
    val out = run("q_snapshot_diff").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.get("added").map(_._1).getOrElse(0L) === added)
    assert(out.get("removed").map(_._1).getOrElse(0L) === removed)
    assert(out.get("changed").map(_._1) === (if (changed > 0) Some(changed) else None))
    assert(out.get("unchanged").map(_._1).getOrElse(0L) === unchanged)
    // every changed doc gained exactly the 7-byte revision marker
    out.get("changed").foreach { case (n, delta) => assert(delta === 7L * n) }
    // unchanged rows must cancel byte-for-byte
    out.get("unchanged").foreach { case (_, delta) => assert(delta === 0L) }
  }

  // --- Spearman rank correlation -------------------------------------------------

  test("spearman rho matches an in-memory tie-averaged recompute") {
    graft.functions.GraftFunctions.register(spark)
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("n_chars"),
        size(array_distinct(call_function("graft_ws_tokens", col("text"))))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def ranks(xs: Array[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val below = sorted.count(_ < v)
        val ties = sorted.count(_ == v)
        v -> (below + (ties + 1) / 2.0)
      }.toMap
    }
    val ra = ranks(d.map(_._1)); val rb = ranks(d.map(_._2))
    val pairs = d.map { case (a, b) => (ra(a), rb(b)) }
    val n = pairs.length.toDouble
    val (sa, sb) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sab = pairs.map(p => p._1 * p._2).sum
    val saa = pairs.map(p => p._1 * p._1).sum
    val sbb = pairs.map(p => p._2 * p._2).sum
    val rho = (n * sab - sa * sb) /
      math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    val r = run("q_spearman").collect().head
    assert(r.getAs[Long]("n") === d.length.toLong)
    // the query's 2x-scaled integer path equals the float definition
    assert(math.abs(r.getAs[Double]("rho") - rho) < 1e-5,
      s"query rho ${r.getAs[Double]("rho")} vs recomputed $rho")
    assert(math.abs(r.getAs[Double]("rho")) <= 1.0)
  }

  // --- neighborhood growth ---------------------------------------------------------

  test("neighborhood growth matches an in-memory capped-BFS recount") {
    graft.functions.GraftFunctions.register(spark)
    val edges = graft.queries.TrainingDataQueries.lshPairDists(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sym = edges.flatMap { case (a, b, d) => Seq((a, b, d), (b, a, d)) }
    val capped = sym.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy { case (_, v, dd) => (dd, v) }.take(8).toSeq
    }.map { case (u, v, _) => (u, v) }.toSet
    val adj = capped.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val perNode = adj.map { case (u, n1set) =>
      val n2set = (n1set ++ n1set.flatMap(v => adj.getOrElse(v, Set.empty))) - u
      (u, n1set.size.toLong, n2set.size.toLong)
    }
    val expected = perNode.groupBy { case (_, n1, n2) => n2 * 10 / n1 }
      .map { case (g, xs) =>
        g -> (xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum) }
    val out = run("q_neighborhood_growth").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === expected)
    // reach can only grow: every bin is at least the 1-hop baseline 10
    assert(out.keys.min >= 10L)
  }

  // --- Wilson interval ------------------------------------------------------------

  test("wilson interval matches the closed form and brackets the rate inside [0,1]") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val out = run("q_wilson_ci").collect()
    out.foreach { r =>
      val lang = r.getString(0)
      val xs = d.filter(_._1 == lang)
      val n = xs.length.toDouble
      val k = xs.count { case (_, c) => c >= 120 && c <= 2000 }.toDouble
      assert(r.getAs[Long]("n") === xs.length.toLong)
      assert(r.getAs[Long]("k") === k.toLong)
      val phat = k / n
      val denom = 1.0 + 3.8416 / n
      val center = (phat + 1.9208 / n) / denom
      val half = 1.96 * math.sqrt((phat * (1.0 - phat) + 0.9604 / n) / n) / denom
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("lo") === r6(center - half))
      assert(r.getAs[Double]("hi") === r6(center + half))
      assert(r.getAs[Double]("lo") >= 0.0 && r.getAs[Double]("hi") <= 1.0)
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("rate") &&
        r.getAs[Double]("rate") <= r.getAs[Double]("hi"))
    }
  }

  // --- Markov stationary distribution ----------------------------------------------

  test("markov stationary matches an in-memory integer power-iteration replay " +
    "and conserves mass up to floor leakage") {
    // ts is TIMESTAMP_NTZ: order by its ISO string form (sorts identically)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts").cast("string").as("tss"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4).toSeq
      seq.zip(seq.drop(1))
    }
    val c = trans.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ci = trans.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val p = c.map { case ((i, j), n) => (i, j) -> n * 1000000L / ci(i) }
    // the query seeds pi over states WITH outgoing transitions (p's i set)
    val states = ci.keySet
    var pi: Map[String, Long] =
      states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to 3) {
      pi = p.toSeq.flatMap { case ((i, j), pf) =>
        pi.get(i).map(v => j -> v * pf / 1000000L)
      }.groupBy(_._1).map { case (j, xs) => j -> xs.map(_._2).sum }
    }
    val out = run("q_markov_stationary").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // query inner-joins row totals, so only states with out-transitions report
    val reporting = pi.keySet.intersect(ci.keySet)
    assert(out.keySet === reporting)
    reporting.foreach { st =>
      assert(out(st) === ((ci(st), pi(st))), s"state $st")
    }
    // total stationary mass: 1e6 minus bounded floor leakage
    val mass = out.values.map(_._2).sum
    assert(mass <= 1000000L && mass > 900000L,
      s"stationary mass $mass drifted more than floor leakage allows")
  }

  // --- degree assortativity ---------------------------------------------------------

  test("assortativity equals the exact stub-Pearson recompute and lies in [-1, 1]") {
    graft.functions.GraftFunctions.register(spark)
    val edges = graft.queries.TrainingDataQueries.lshPairDists(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val stubs = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val m2 = stubs.length.toLong
    val sx = stubs.map(_._1).sum
    val sxy = stubs.map(s => s._1 * s._2).sum
    val sxx = stubs.map(s => s._1 * s._1).sum
    val rExp = (m2 * sxy - sx * sx).toDouble / (m2 * sxx - sx * sx).toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val r = run("q_assortativity").collect().head
    assert(r.getAs[Long]("m2") === m2)
    assert(r.getAs[Double]("r") === r6(rExp))
    assert(math.abs(r.getAs[Double]("r")) <= 1.0)
  }

  // --- Cavnar–Trenkle language ID ---------------------------------------------------

  test("ct lang-id confusion matrix matches an exact in-memory profile replay") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // over the ENRICHED corpus twin, replayed byte-identically
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), EnrichReplay.text2(
        r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)).toLowerCase))
      .filter(d => d._3.codePointCount(0, d._3.length) >= 3)
    val (train, test) = docs.partition { case (id, _, _) =>
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 100 < 80 }
    // packed-codepoint trigram ids, mirroring graft_tri_ids exactly
    def tris(t: String): Seq[Long] = {
      val cps = t.codePoints().toArray
      (0 to cps.length - 3).map(i =>
        cps(i).toLong * 4398046511104L + cps(i + 1).toLong * 2097152L + cps(i + 2).toLong)
    }
    val P = 40
    val prof: Map[String, Map[Long, Int]] = train.groupBy(_._2).map {
      case (lang, ds) =>
        val counts = ds.flatMap(d => tris(d._3)).groupBy(identity)
          .map { case (k, v) => k -> v.length.toLong }
        lang -> counts.toSeq.sortBy { case (sid, c) => (-c, sid) }.take(P)
          .zipWithIndex.map { case ((sid, _), i) => sid -> (i + 1) }.toMap
    }
    val confusion = test.map { case (_, lang, t) =>
      val counts = tris(t).groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val dp = counts.toSeq.sortBy { case (sid, c) => (-c, sid) }.take(P)
        .zipWithIndex.map { case ((sid, _), i) => sid -> (i + 1) }
      val cand = prof.toSeq.flatMap { case (plang, pm) =>
        val matched = dp.filter { case (sid, _) => pm.contains(sid) }
        if (matched.isEmpty) None
        else {
          val d = matched.map { case (sid, dr) => math.abs(dr - pm(sid)).toLong }.sum
          Some(plang -> (d + (dp.length - matched.length).toLong * P))
        }
      }
      val pred = cand.minBy { case (pl, d) => (d, pl) }._1
      (lang, pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = run("q_ct_lang_id").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === confusion)
  }

  // --- k-core peeling ------------------------------------------------------------------

  test("k-core rounds match an in-memory peel with the adaptive threshold") {
    graft.functions.GraftFunctions.register(spark)
    val edges = graft.queries.TrainingDataQueries.lshPairDists(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    def degs(es: Array[(Long, Long)]): Map[Long, Long] =
      es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
    val d0 = degs(edges)
    val n0 = d0.size.toLong
    val kc = d0.toSeq.sortBy { case (n, d) => (d, n) }
      .apply(((n0 + 3) / 4 - 1).toInt)._2 + 1
    def peel(es: Array[(Long, Long)]): Array[(Long, Long)] = {
      val keep = degs(es).filter(_._2 >= kc).keySet
      es.filter { case (a, b) => keep(a) && keep(b) }
    }
    val e1 = peel(edges); val e2 = peel(e1)
    def statRow(r: Int, es: Array[(Long, Long)]) = {
      val d = degs(es)
      (r, d.size.toLong, es.length.toLong,
        if (d.isEmpty) 0L else d.values.min, kc)
    }
    val expected = Seq(statRow(0, edges), statRow(1, e1), statRow(2, e2))
    val out = run("q_kcore").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq === expected)
    // peeling is monotone
    assert(out(0)._2 >= out(1)._2 && out(1)._2 >= out(2)._2)
    assert(out(0)._3 >= out(1)._3 && out(1)._3 >= out(2)._3)
  }

  // --- McNemar paired gate comparison -----------------------------------------------

  test("mcnemar discordant counts and statistic match an exact recompute") {
    val scores = graft.queries.CurationQueries.probeScores(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nch = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val tau = scores.sortBy { case (id, _, sc) => (sc, id) }
      .apply(((scores.length + 1) / 2 - 1))._3
    var (b, c, bothOk) = (0L, 0L, 0L)
    scores.foreach { case (id, y, sc) =>
      val pa = if (sc > tau) 1L else 0L
      val pb = if (nch(id) >= 120 && nch(id) <= 2000) 1L else 0L
      (pa == y, pb == y) match {
        case (true, false) => b += 1
        case (false, true) => c += 1
        case (true, true)  => bothOk += 1
        case _             =>
      }
    }
    val r = run("q_mcnemar").collect().head
    assert(r.getAs[Long]("n") === scores.length.toLong)
    assert((r.getAs[Long]("b"), r.getAs[Long]("c"),
      r.getAs[Long]("both_ok")) === ((b, c, bothOk)))
    val stat = if (b + c > 0) (b - c) * (b - c) * 1000000L / (b + c) else 0L
    assert(r.getAs[Long]("stat_fp") === stat)
  }

  // --- Kaplan–Meier survival -----------------------------------------------------------

  test("kaplan-meier matches an in-memory product-limit replay; survival is " +
    "monotone non-increasing and risk sets telescope") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t0 = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val tend = ev.map(_._3).max
    val tp = ev.filter(_._2 == "purchase")
      .filter(_._1 % 5 != 3) // the deterministic non-converter cohort
      .filter { case (u, _, es) => t0.contains(u) && es >= t0(u) }
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val durs = t0.toSeq.map { case (u, t) =>
      (tp.get(u).getOrElse(tend) - t, if (tp.contains(u)) 1L else 0L) }
    val mx = durs.map(_._1).max
    val byB = durs.groupBy { case (d, _) => d * 8 / (mx + 1) }
    val d = (0 until 8).map(k => byB.getOrElse(k.toLong, Seq()).map(_._2).sum)
    val c = (0 until 8).map(k =>
      byB.getOrElse(k.toLong, Seq()).map(x => 1L - x._2).sum)
    val n = (0 until 8).map(k => (k until 8).map(j => d(j) + c(j)).sum)
    var sPrev = 1000000000L
    val sv = (0 until 8).map { k =>
      if (n(k) > 0) sPrev = sPrev * (n(k) - d(k)) / n(k)
      sPrev
    }
    val out = run("q_kaplan_meier").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.length === 8)
    out.foreach { case (k, tHi, nr, dk, ck, s) =>
      assert(tHi === (k + 1).toLong * (mx + 1) / 8)
      assert(nr === n(k)); assert(dk === d(k)); assert(ck === c(k))
      assert(s === sv(k), s"bucket $k")
    }
    // product-limit structure: S non-increasing, n telescoping
    assert(out.map(_._6).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(out.head._3 === t0.size.toLong, "risk set at bucket 0 = all subjects")
  }

  // --- co-occurrence lift --------------------------------------------------------------

  test("cooccur lift matches an exact basket recount; bounds hold") {
    // baskets replayed WITH the deterministic zipfian thinning
    val basket = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (u, t) => EnrichReplay.keepBasket(u, t) }
    val byUser = basket.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
    val nUsers = byUser.size.toLong
    val item = basket.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val pairCounts = byUser.values.toSeq.flatMap { ts =>
      val s = ts.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val out = run("q_cooccur_lift").collect()
    assert(out.length === pairCounts.size)
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n_ab") === pairCounts((ta, tb)))
      assert(r.getAs[Long]("n_a") === item(ta))
      assert(r.getAs[Long]("n_b") === item(tb))
      assert(r.getAs[Long]("lift_ppm") ===
        pairCounts((ta, tb)) * nUsers * 1000000L / (item(ta) * item(tb)))
      // support can never exceed either marginal
      assert(r.getAs[Long]("n_ab") <= math.min(item(ta), item(tb)))
    }
  }
}
