package graft

import graft.fixtures.TranscriptGen
import graft.pipeline.{ExtractionPipeline, Ingestion}
import graft.retrieval.{QueryPipeline, VectorIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** IVF vector index: exactness at full probe (probing every cell must
  * reproduce the brute-force scan bit-for-bit), partition pruning at
  * narrow probe (only the probed cells' files are read), survival of the
  * incremental add and cascade delete lifecycles, and QueryPipeline's
  * auto-detection of the index.
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val NBuckets = 4

  private def store(convs: Range): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("vix").toString
    val turns = spark.createDataset(
      convs.flatMap(i => TranscriptGen.conversation(13L, i.toLong)))
    ExtractionPipeline.run(spark, turns,
      ExtractionPipeline.Config(out, nBuckets = NBuckets, waves = 1, resume = false))
    Ingestion.run(spark, out)
    out
  }

  private def bruteForce(out: String, qv: Array[Float]): Map[String, Double] = {
    import spark.implicits._
    spark.read.parquet(Ingestion.embeddingsDir(out))
      .select(concat_ws(":", col("conv_id"), col("turn_idx"), col("chunk_index"))
        .as("chunk_id"), VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect().toMap
  }

  private def probeAll(out: String, qv: Array[Float], nlist: Int): Map[String, Double] = {
    import spark.implicits._
    VectorIndex.probe(spark, VectorIndex.indexRoot(out), qv, nprobe = nlist)
      .as[(String, Double)].collect().toMap
  }

  test("aggregate Lloyd round matches the relational reference bit-for-bit") {
    import spark.implicits._
    val out = store(0 until 6)
    val e = spark.read.parquet(Ingestion.embeddingsDir(out))
      .select(concat_ws(":", col("conv_id"), col("turn_idx"), col("chunk_index"))
        .as("chunk_id"), col("embedding"))
    val k = 8
    // iters = 0 returns the deterministic seeds — the shared round input
    val seeds = VectorIndex.trainCentroids(e, k, iters = 0)
    // the round-4 aggregate path (graft_vec_sum: O(cells·partitions)
    // shuffle) must reproduce the relational posexplode → avg form
    // (O(N·d) shuffle) exactly: same adds in the same within-partition
    // order, same sum/count division
    val rel = VectorIndex.lloydRoundRelational(e, seeds)
    def norm(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val expected = seeds.indices.map(c => norm(rel.getOrElse(c, seeds(c))))
    val got = VectorIndex.trainCentroids(e, k, iters = 1)
    assert(got == expected, "aggregate-path centroids must equal the relational form")
  }

  test("null/empty embeddings are dropped from training as posexplode did") {
    import spark.implicits._
    val out = store(0 until 6)
    val clean = spark.read.parquet(Ingestion.embeddingsDir(out))
      .select(concat_ws(":", col("conv_id"), col("turn_idx"), col("chunk_index"))
        .as("chunk_id"), col("embedding"))
    val dim = clean.select(size(col("embedding"))).as[Int].head()
    // rows a posexplode-based Lloyd mean contributed NOTHING for: the
    // aggregate path must reproduce that drop (ADVICE r4), not NPE or
    // throw on an empty per-cell sum
    val dirty = clean.unionByName(
      Seq(("null:0:0", null: Seq[Double]), ("empty:0:0", Seq.empty[Double]))
        .toDF("chunk_id", "embedding")
        .select(col("chunk_id"), col("embedding").cast(s"array<double>")))
    val k = 8
    val got = VectorIndex.trainCentroids(dirty, k, iters = 1)
    val expected = VectorIndex.trainCentroids(clean, k, iters = 1)
    assert(got == expected,
      "null/empty embedding rows must not perturb the trained centroids")
    assert(got.forall(_.length == dim))
  }

  test("graft_vec_sum refuses null ARRAY ELEMENTS loudly") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
    val e = intercept[Exception](
      df.agg(call_function("graft_vec_sum", col("v"))).collect())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("null element")),
      s"expected the loud null-element refusal, got: $e")
  }

  test("probing every cell reproduces the brute-force scan exactly") {
    val out = store(0 until 6)
    val nlist = Ingestion.buildVectorIndex(spark, out)
    assert(nlist >= 8)
    val qv = Ingestion.hashedEmbedding("tool output table")
    assert(probeAll(out, qv, nlist) == bruteForce(out, qv),
      "all-cells probe == brute force (ids and scores)")
  }

  test("narrow probe is a partition-pruned read with score parity") {
    val out = store(0 until 6)
    Ingestion.buildVectorIndex(spark, out)
    val qv = Ingestion.hashedEmbedding("heading structure")
    val probed = VectorIndex.probe(spark, VectorIndex.indexRoot(out), qv, nprobe = 1)
    import spark.implicits._
    val rows = probed.as[(String, Double)].collect()
    assert(rows.nonEmpty)

    // the cell filter must be a PARTITION filter on the parquet scan
    // (pruned at file-listing time, not a post-scan data filter), and the
    // executed scan must have opened at most one cell's worth of files
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
    val scan = scans(probed.queryExecution.executedPlan).head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"cell must be a partition filter, got: ${scan.partitionFilters}")
    import scala.jdk.CollectionConverters._
    val filesPerCell = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(
        VectorIndex.assignmentsDir(VectorIndex.indexRoot(out)))))(
      _.iterator().asScala.filter(_.getFileName.toString.startsWith("cell=")).toVector)
      .map(d => scala.util.Using.resource(java.nio.file.Files.list(d))(
        _.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))))
    assert(scan.metrics("numFiles").value <= filesPerCell.max,
      s"nprobe=1 scan opened ${scan.metrics("numFiles").value} files; " +
        s"one cell holds at most ${filesPerCell.max}")

    // every probed candidate carries the same score the exact scan gives it
    val bf = bruteForce(out, qv)
    rows.foreach { case (id, s) => assert(bf(id) == s, s"score parity for $id") }
  }

  test("QueryPipeline auto-detects the index; full probe stays exact") {
    val out = store(0 until 6)
    val twin = store(0 until 6) // identical corpus, no index
    val nlist = Ingestion.buildVectorIndex(spark, out)
    import spark.implicits._
    def res(dir: String, nprobe: Int) =
      QueryPipeline.query(spark, dir, "assistant explains spans", topK = 5,
        nprobe = nprobe)
        .select("chunk_id", "rrf_score").as[(String, Double)].collect().toSeq
    assert(res(out, nlist) == res(twin, nlist),
      "indexed store at full probe == unindexed brute force")
    assert(res(out, 2).nonEmpty, "default-width probe returns results")
  }

  test("incremental add: all-cells probe stays exact over the union") {
    import spark.implicits._
    val out = store(0 until 5)
    val nlist = Ingestion.buildVectorIndex(spark, out)
    val staging = {
      val s = Files.createTempDirectory("vix-stage").toString
      val turns = spark.createDataset(
        (5 until 8).flatMap(i => TranscriptGen.conversation(13L, i.toLong)))
      ExtractionPipeline.run(spark, turns,
        ExtractionPipeline.Config(s, nBuckets = NBuckets, waves = 1, resume = false))
      s
    }
    Ingestion.add(spark, out, staging)
    val qv = Ingestion.hashedEmbedding("code block content")
    assert(probeAll(out, qv, nlist) == bruteForce(out, qv),
      "index extended by add covers the union exactly")
  }

  test("on clustered data, a 2-of-16-cell probe recovers >=0.9 recall@10") {
    // q_ann_recall documents the ISOTROPIC floor (recall ≈ probed
    // fraction when vectors have no structure); this is the other half
    // of the claim: on data that DOES cluster — the real-embedding case
    // — the IVF structure must recover near-exact recall while scanning
    // a small fraction of the corpus.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 32
    val centers = IndexedSeq.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    val points = (0 until 960).map { i =>
      val c = centers(i % 16)
      (f"p$i%04d", c.map(v => (v + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val emb = points.toDF("chunk_id", "embedding")
    val root = Files.createTempDirectory("vix-recall").toString
    VectorIndex.build(emb, root, nlist = Some(16))

    val qv = centers(3).map(v => (v + 0.05 * rnd.nextGaussian()).toFloat)
    def topIds(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.as[(String, Double)].collect()
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq

    val exact = topIds(emb.select(col("chunk_id"),
      VectorIndex.dotColumn(qv, col("embedding")).as("score")))
    val probed = VectorIndex.probe(spark, root, qv, nprobe = 2)
    val approx = topIds(probed)
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.9, s"clustered recall@10 = $recall, expected >= 0.9")
    // and the probe really did skip most of the corpus (k-means may
    // merge a couple of natural clusters into one cell, so the bound is
    // a third of the corpus, not 2/16 exactly)
    val scanned = probed.count()
    assert(scanned <= 960 / 3,
      s"probe scanned $scanned of 960 rows — pruning did not engage")
  }

  test("cascade delete removes the conversation from the index") {
    val out = store(0 until 5)
    val nlist = Ingestion.buildVectorIndex(spark, out)
    Ingestion.delete(spark, out, Seq("conv-000002"))
    val qv = Ingestion.hashedEmbedding("user asks question")
    val probed = probeAll(out, qv, nlist)
    assert(!probed.keys.exists(_.startsWith("conv-000002:")),
      "deleted conversation's chunks are gone from the index")
    assert(probed == bruteForce(out, qv),
      "index matches the post-delete embeddings table exactly")
  }
}
