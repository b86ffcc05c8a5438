package graft

import graft.retrieval.{IvfPqIndex, PqIndex, VectorIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Parameter-space fuzz for the PQ index family: across random (dim, m,
  * ks, nlist, n) configurations, the invariants that must hold at EVERY
  * shape — codes are m bytes, full-width rerank equals brute force
  * exactly, and an indivisible dim fails loudly — not just at the two
  * shapes the unit specs pin.
  */
class PqFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rnd: scala.util.Random, n: Int, dim: Int): Seq[(String, Seq[Float])] = {
    val centers = IndexedSeq.fill(6)(Array.fill(dim)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val c = centers(i % 6)
      (f"p$i%04d", c.map(v => (v + 0.1 * rnd.nextGaussian()).toFloat).toSeq)
    }
  }

  test("PqIndex invariants hold across 8 random (dim, m, ks, n) shapes") {
    val rnd = new scala.util.Random(271)
    for (case_ <- 0 until 8) {
      val m = Seq(2, 4, 8)(rnd.nextInt(3))
      val dim = m * (1 + rnd.nextInt(12))
      val ks = 2 + rnd.nextInt(30)
      val n = 20 + rnd.nextInt(100)
      val info = s"case $case_: dim=$dim m=$m ks=$ks n=$n"
      val points = corpus(rnd, n, dim)
      val emb = points.toDF("chunk_id", "embedding")
      val root = Files.createTempDirectory(s"pqfz$case_").toString
      val trained = PqIndex.build(emb, root, m = m, ks = ks)
      assert(trained == math.min(ks, n), info)

      val codes = spark.read.parquet(PqIndex.codesDir(root))
        .select("codes").as[Array[Byte]].collect()
      assert(codes.length == n && codes.forall(_.length == m), info)

      val qv = points(rnd.nextInt(n))._2.toArray
      val exact = emb.select(col("chunk_id"),
        VectorIndex.dotColumn(qv, col("embedding")).as("score"))
        .as[(String, Double)].collect()
        .sortBy { case (id, s) => (-s, id) }.take(5).toSeq
      val got = PqIndex.rerank(spark, root, qv, emb, fetch = n, topK = 5)
        .as[(String, Double)].collect().toSeq
      assert(got == exact, info)
    }
  }

  test("IvfPqIndex invariants hold across 6 random (dim, m, ks, nlist, n) shapes") {
    val rnd = new scala.util.Random(977)
    for (case_ <- 0 until 6) {
      val m = Seq(2, 4)(rnd.nextInt(2))
      val dim = m * (2 + rnd.nextInt(10))
      val ks = 2 + rnd.nextInt(20)
      val nlist = 2 + rnd.nextInt(10)
      val n = 30 + rnd.nextInt(90)
      val info = s"case $case_: dim=$dim m=$m ks=$ks nlist=$nlist n=$n"
      val points = corpus(rnd, n, dim)
      val emb = points.toDF("chunk_id", "embedding")
      val root = Files.createTempDirectory(s"ivfpqfz$case_").toString
      IvfPqIndex.build(emb, root, nlist = Some(nlist), m = m, ks = ks)

      val qv = points(rnd.nextInt(n))._2.toArray
      val exact = emb.select(col("chunk_id"),
        VectorIndex.dotColumn(qv, col("embedding")).as("score"))
        .as[(String, Double)].collect()
        .sortBy { case (id, s) => (-s, id) }.take(5).toSeq
      val got = IvfPqIndex.rerank(spark, root, qv, emb,
        nprobe = nlist, fetch = n, topK = 5)
        .as[(String, Double)].collect().toSeq
      assert(got == exact, info)
    }
  }

  test("an indivisible dim and an oversized ks fail loudly at build time") {
    val rnd = new scala.util.Random(3)
    val emb = corpus(rnd, 20, 10).toDF("chunk_id", "embedding")
    val root = Files.createTempDirectory("pqfz-bad").toString
    intercept[IllegalArgumentException] {
      PqIndex.build(emb, root, m = 4, ks = 8) // 10 % 4 != 0
    }
    intercept[IllegalArgumentException] {
      PqIndex.build(emb, root, m = 2, ks = 300) // > 256
    }
  }
}
