package graft

import graft.retrieval.{PqIndex, VectorIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Product-quantization index: the persisted codes really are m bytes
  * per vector, the codegen'd ADC scan matches a driver-side recompute
  * bit-for-bit, rerank restores exact brute-force ordering, clustered
  * data recovers high recall at a small fetch, and the add / delete /
  * compact lifecycle holds.
  */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Dim = 32
  private val M = 4
  private val Ks = 16

  /** Deterministic clustered corpus: `n` points around 16 Gaussian
    * centers (the real-embedding case PQ is built for).
    */
  private def clustered(n: Int, seed: Long = 7L): Seq[(String, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    val centers = IndexedSeq.fill(16)(Array.fill(Dim)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % 16)
      (f"p$i%04d", c.map(v => (v + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
  }

  private def buildIndex(points: Seq[(String, Seq[Float])]): String = {
    val root = Files.createTempDirectory("pqix").toString
    PqIndex.build(points.toDF("chunk_id", "embedding"), root, m = M, ks = Ks)
    root
  }

  /** Driver-side PQ encode with the same loop order as the codegen'd
    * `graft_pq_encode` (subtract, square, accumulate left-to-right) — a
    * bit-identical independent oracle for the scan.
    */
  private def encodeRef(e: Seq[Double], books: PqIndex.Books): Seq[Int] = {
    var off = 0
    books.map { book =>
      val w = book.head.length
      var best = 0
      var bestD = Double.PositiveInfinity
      for (c <- book.indices) {
        var d2 = 0.0
        var i = 0
        while (i < w) {
          val dx = e(off + i) - book(c)(i); d2 += dx * dx; i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
      }
      off += w
      best
    }
  }

  test("codes are exactly m bytes per vector — the storage contract") {
    val points = clustered(200)
    val root = buildIndex(points)
    val codes = spark.read.parquet(PqIndex.codesDir(root))
      .select("codes").as[Array[Byte]].collect()
    assert(codes.length == 200)
    assert(codes.forall(_.length == M), s"every code row must be $M bytes")
    val books = PqIndex.loadBooks(spark, root)
    assert(books.length == M && books.forall(_.length == Ks))
  }

  test("codes parquet is at least 8x smaller on disk than the raw embeddings") {
    // the storage CLAIM, measured: m=4 bytes/vector vs 32 floats — the
    // parquet files (with their own encodings on both sides) must show
    // a large real shrink, not just a logical one
    val points = clustered(2000)
    val root = buildIndex(points)
    val rawDir = Files.createTempDirectory("pq-raw").toString
    points.toDF("chunk_id", "embedding").write.mode("overwrite").parquet(rawDir)
    def bytes(dir: String): Long =
      scala.util.Using.resource(Files.walk(java.nio.file.Paths.get(dir)))(
        _.filter(p => p.toString.endsWith(".parquet")).mapToLong(Files.size).sum())
    val raw = bytes(rawDir)
    val codes = bytes(PqIndex.codesDir(root))
    assert(codes * 8 < raw,
      s"codes $codes B vs raw $raw B — expected >= 8x shrink")
  }

  test("ADC scan matches a driver-side recompute bit-for-bit") {
    val points = clustered(200)
    val root = buildIndex(points)
    val books = PqIndex.loadBooks(spark, root)
    val qv = points(37)._2.toArray.map(x => x)

    val got = PqIndex.scan(spark, root, qv, topK = 200)
      .as[(String, Double)].collect().toMap

    val lut = PqIndex.lut(books, qv)
    val want = points.map { case (id, e) =>
      val codes = encodeRef(e.map(_.toDouble), books)
      id -> codes.zipWithIndex.foldLeft(0.0) { case (s, (c, j)) => s + lut(j)(c) }
    }.toMap
    assert(got == want, "ADC scores (all rows) must equal the reference fold")
  }

  test("rerank at full fetch reproduces the exact brute-force top-k") {
    val points = clustered(300)
    val root = buildIndex(points)
    val emb = points.toDF("chunk_id", "embedding")
    val qv = points(11)._2.toArray

    val exact = emb.select(col("chunk_id"),
      VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = PqIndex.rerank(spark, root, qv, emb, fetch = 300, topK = 10)
      .as[(String, Double)].collect().toSeq
    assert(got == exact, "full-fetch rerank == brute force (ids AND scores)")
  }

  // PQ resolves BETWEEN clusters, not within one tighter than the
  // codeword resolution: every member of a tight cluster encodes to the
  // same m codes and ties on ADC, so the fetch must cover the tied code
  // group (here one 60-member cluster) — fetch 100 ≈ a 10% scan.
  test("clustered recall@10 >= 0.9 from a fetch of 100 of 960 rows") {
    val points = clustered(960)
    val root = buildIndex(points)
    val emb = points.toDF("chunk_id", "embedding")
    val rnd = new scala.util.Random(99)
    val qv = points(3)._2.map(v => (v + 0.02 * rnd.nextGaussian()).toFloat).toArray

    val exact = emb.select(col("chunk_id"),
      VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val approx = PqIndex.rerank(spark, root, qv, emb, fetch = 100, topK = 10)
      .as[(String, Double)].collect().map(_._1).toSet
    val recall = exact.intersect(approx).size / 10.0
    assert(recall >= 0.9, s"clustered recall@10 = $recall, expected >= 0.9")
  }

  test("add encodes against frozen codebooks; scan covers the union") {
    val points = clustered(200)
    val extra = clustered(40, seed = 21L).map { case (id, e) => (s"x$id", e) }
    val root = buildIndex(points)
    val booksBefore = PqIndex.loadBooks(spark, root)
    PqIndex.add(extra.toDF("chunk_id", "embedding"), root)

    assert(PqIndex.loadBooks(spark, root) == booksBefore, "codebooks frozen")
    val qv = extra.head._2.toArray
    val ids = PqIndex.scan(spark, root, qv, topK = 240)
      .as[(String, Double)].collect().map(_._1).toSet
    assert(ids.size == 240, "scan sees all 200 + 40 vectors")
    assert(extra.forall { case (id, _) => ids.contains(id) })
  }

  test("corpus smaller than ks trains a truncated codebook and stays exact") {
    val points = clustered(5)
    val root = Files.createTempDirectory("pqix-tiny").toString
    val trained = PqIndex.build(points.toDF("chunk_id", "embedding"), root,
      m = M, ks = Ks)
    assert(trained == 5, "codebook truncates to the corpus size")
    val emb = points.toDF("chunk_id", "embedding")
    val qv = points(2)._2.toArray
    val exact = emb.select(col("chunk_id"),
      VectorIndex.dotColumn(qv, col("embedding")).as("score"))
      .as[(String, Double)].collect().sortBy { case (id, s) => (-s, id) }.toSeq
    val got = PqIndex.rerank(spark, root, qv, emb, fetch = 5, topK = 5)
      .as[(String, Double)].collect().toSeq
    assert(got == exact)
  }

  test("QueryPipeline auto-detects the PQ index; full-coverage fetch stays exact") {
    import graft.fixtures.TranscriptGen
    import graft.pipeline.{ExtractionPipeline, Ingestion}
    import graft.retrieval.QueryPipeline
    def store(): String = {
      val out = Files.createTempDirectory("pqq").toString
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
    Ingestion.buildPqIndex(spark, out, m = 8, ks = 16)
    def res(dir: String) =
      QueryPipeline.query(spark, dir, "assistant explains spans", topK = 5)
        .select("chunk_id", "rrf_score").as[(String, Double)].collect().toSeq
    assert(res(out) == res(twin),
      "PQ-indexed store at full-coverage fetch == unindexed brute force")
  }

  test("a crashed rebuild's partial version dir is invisible and overwritten") {
    val points = clustered(100)
    val root = buildIndex(points)
    val booksBefore = PqIndex.loadBooks(spark, root)
    val qv = points(5)._2.toArray
    val before = PqIndex.scan(spark, root, qv, topK = 100)
      .as[(String, Double)].collect().toSeq

    // simulate a rebuild that died after writing partial files but
    // BEFORE the pointer flip: junk under the next version dir
    val junk = java.nio.file.Paths.get(root, "v2", "codes")
    Files.createDirectories(junk)
    Files.write(junk.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))

    // readers resolve through the pointer — the crash residue is invisible
    assert(PqIndex.loadBooks(spark, root) == booksBefore)
    assert(PqIndex.scan(spark, root, qv, topK = 100)
      .as[(String, Double)].collect().toSeq == before)

    // the next build claims v2, overwrites the residue, and flips
    PqIndex.build(points.toDF("chunk_id", "embedding"), root, m = M, ks = Ks)
    val after = PqIndex.scan(spark, root, qv, topK = 100)
      .as[(String, Double)].collect().toSeq
    assert(after.map(_._1).toSet == before.map(_._1).toSet,
      "rebuild over crash residue serves the full corpus")
  }

  test("delete removes ids; compact preserves scan output exactly") {
    val points = clustered(200)
    val root = buildIndex(points)
    val emb = points.toDF("chunk_id", "embedding")
    PqIndex.add(emb.filter(col("chunk_id") < "p0000"), root) // no-op append file
    val victims = Seq("p0003", "p0007").toDF("chunk_id")
    PqIndex.delete(spark, victims, "chunk_id", root)

    val qv = points.head._2.toArray
    val after = PqIndex.scan(spark, root, qv, topK = 200)
      .as[(String, Double)].collect().toSeq
    assert(after.length == 198)
    assert(!after.exists(r => r._1 == "p0003" || r._1 == "p0007"))

    PqIndex.compact(spark, root)
    val compacted = PqIndex.scan(spark, root, qv, topK = 200)
      .as[(String, Double)].collect().toSeq
    assert(compacted == after, "compaction must not change scan results")
  }
}
