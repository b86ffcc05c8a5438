package graft

import graft.retrieval.{IvfPqIndex, PqIndex, VectorIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** IVF-PQ: cell-partitioned byte codes over residuals. The probe's ADC
  * scores must match a driver-side recompute bit-for-bit, the pruned
  * scan must really skip the unprobed cells' files, full-width rerank
  * must restore exact brute-force ordering, clustered data must recover
  * high recall at a narrow probe, and the add/delete/compact lifecycle
  * must hold.
  */
class IvfPqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Dim = 32
  private val M = 4
  private val Ks = 16
  private val NCells = 16

  private def clustered(n: Int, seed: Long = 7L): Seq[(String, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = IndexedSeq.fill(16)(Array.fill(Dim)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % 16)
      (f"p$i%04d", c.map(v => (v + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
  }

  private def buildIndex(points: Seq[(String, Seq[Float])]): String = {
    val root = Files.createTempDirectory("ivfpq").toString
    IvfPqIndex.build(points.toDF("chunk_id", "embedding"), root,
      nlist = Some(NCells), m = M, ks = Ks)
    root
  }

  /** Driver twin of the scoring path: assign cell (argmax dot, ties →
    * lowest), encode the residual (argmin L2 per subspace), then
    * `Σⱼ lut[j][codeⱼ] + q·centroid` with the same fold orders.
    */
  private def scoreRef(e: Seq[Double], qd: Array[Double],
      cents: IndexedSeq[Seq[Double]], books: PqIndex.Books): Double = {
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val cell = cents.zipWithIndex.maxBy { case (c, i) => (dot(e, c), -i) }._2
    val r = e.zip(cents(cell)).map { case (a, b) => a - b }
    val w = books.head.head.length
    var adc = 0.0
    for ((book, j) <- books.zipWithIndex) {
      val code = book.zipWithIndex.map { case (cent, c) =>
        var d2 = 0.0; var i = 0
        while (i < w) { val dx = r(j * w + i) - cent(i); d2 += dx * dx; i += 1 }
        (d2, c)
      }.min._2
      var t = 0.0; var i = 0
      while (i < w) { t += qd(j * w + i) * book(code)(i); i += 1 }
      adc += t
    }
    adc + dot(qd.toSeq, cents(cell))
  }

  test("full probe ADC matches the driver recompute bit-for-bit") {
    val points = clustered(240)
    val root = buildIndex(points)
    val cents = spark.read.parquet(IvfPqIndex.centroidsDir(root))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).map(_._2).toIndexedSeq
    val books = IvfPqIndex.loadBooks(spark, root)
    val qv = points(17)._2.toArray
    val qd = qv.map(_.toDouble)

    val got = IvfPqIndex.probe(spark, root, qv, nprobe = NCells, fetch = 240)
      .as[(String, Double)].collect().toMap
    val want = points.map { case (id, e) =>
      id -> scoreRef(e.map(_.toDouble), qd, cents, books)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, s) =>
      assert(java.lang.Double.doubleToLongBits(s) ==
        java.lang.Double.doubleToLongBits(want(id)), s"$id: $s vs ${want(id)}")
    }
  }

  test("full-width rerank reproduces the exact brute-force top-k") {
    val points = clustered(300)
    val root = buildIndex(points)
    val emb = points.toDF("chunk_id", "embedding")
    val qv = points(11)._2.toArray
    val exact = emb.select(col("chunk_id"),
      VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = IvfPqIndex.rerank(spark, root, qv, emb,
      nprobe = NCells, fetch = 300, topK = 10)
      .as[(String, Double)].collect().toSeq
    assert(got == exact, "full probe + full fetch + rerank == brute force")
  }

  test("narrow probe is a partition-pruned read; clustered recall@10 >= 0.9") {
    val points = clustered(960)
    val root = buildIndex(points)
    val emb = points.toDF("chunk_id", "embedding")
    val rnd = new scala.util.Random(99)
    val qv = points(3)._2.map(v => (v + 0.02 * rnd.nextGaussian()).toFloat).toArray

    val probed = IvfPqIndex.probe(spark, root, qv, nprobe = 2, fetch = 960)
    // the cell filter must prune at the parquet partition level
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val scanned = probed.as[(String, Double)].collect()
    val scan = scans(probed.queryExecution.executedPlan).head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"cell must be a partition filter, got: ${scan.partitionFilters}")
    assert(scanned.length <= 960 / 3,
      s"2-of-$NCells probe scanned ${scanned.length} of 960 rows")

    val exact = emb.select(col("chunk_id"),
      VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val approx = IvfPqIndex.rerank(spark, root, qv, emb,
      nprobe = 2, fetch = 100, topK = 10)
      .as[(String, Double)].collect().map(_._1).toSet
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.9, s"clustered recall@10 = $recall, expected >= 0.9")
  }

  test("QueryPipeline auto-detects the IVF-PQ index; full-coverage probe stays exact") {
    import graft.fixtures.TranscriptGen
    import graft.pipeline.{ExtractionPipeline, Ingestion}
    import graft.retrieval.QueryPipeline
    def store(): String = {
      val out = Files.createTempDirectory("ivfpqq").toString
      val turns = spark.createDataset(
        (0 until 2).flatMap(i => TranscriptGen.conversation(13L, i.toLong)))
      ExtractionPipeline.run(spark, turns,
        ExtractionPipeline.Config(out, nBuckets = 4, waves = 1, resume = false))
      Ingestion.run(spark, out)
      out
    }
    val out = store()
    val twin = store() // identical corpus, no index
    val n = spark.read.parquet(Ingestion.embeddingsDir(out)).count()
    assert(n <= QueryPipeline.PqFetch,
      s"fixture must fit the ADC fetch for the exactness claim ($n rows)")
    val (nlist, _) = Ingestion.buildIvfPqIndex(spark, out, m = 8, ks = 16)
    def res(dir: String) =
      QueryPipeline.query(spark, dir, "assistant explains spans", topK = 5,
        nprobe = nlist)
        .select("chunk_id", "rrf_score").as[(String, Double)].collect().toSeq
    assert(res(out) == res(twin),
      "IVF-PQ-indexed store at full probe + full fetch == unindexed brute force")
  }

  test("add / delete / compact lifecycle") {
    val points = clustered(200)
    val extra = clustered(40, seed = 21L).map { case (id, e) => (s"x$id", e) }
    val root = buildIndex(points)
    IvfPqIndex.add(extra.toDF("chunk_id", "embedding"), root)
    val qv = extra.head._2.toArray
    def ids(): Set[String] =
      IvfPqIndex.probe(spark, root, qv, nprobe = NCells, fetch = 240)
        .as[(String, Double)].collect().map(_._1).toSet
    assert(ids().size == 240, "probe sees all 200 + 40 vectors after add")
    assert(extra.forall { case (id, _) => ids().contains(id) })

    IvfPqIndex.delete(spark, Seq("p0003", "xp0000").toDF("chunk_id"),
      "chunk_id", root)
    val afterDelete = ids()
    assert(!afterDelete.contains("p0003") && !afterDelete.contains("xp0000"))
    assert(afterDelete.size == 238)

    val before = IvfPqIndex.probe(spark, root, qv, nprobe = NCells, fetch = 240)
      .as[(String, Double)].collect().toSeq
    IvfPqIndex.compact(spark, root)
    val after = IvfPqIndex.probe(spark, root, qv, nprobe = NCells, fetch = 240)
      .as[(String, Double)].collect().toSeq
    assert(after == before, "compaction must not change probe results")
  }
}
