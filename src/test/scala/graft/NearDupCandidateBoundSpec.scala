package graft

import graft.queries.TrainingDataQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical sub-quadratic evidence for the near-dup candidate
  * generators (the round-1 verdict's ask: "candidate count provably
  * stays sub-quadratic — log the candidate ratio"). Each family's
  * blocking must surface a small fraction of the N(N−1)/2 pair space;
  * a ratio near 1.0 would mean the blocking degenerated into the
  * all-pairs scan it exists to avoid. Ratios are logged so the bound
  * is visible in the test report, and the 10% ceiling is loose enough
  * to survive fixture growth while still failing on any quadratic
  * regression (a degenerate single-bucket join scores ~1.0).
  */
class NearDupCandidateBoundSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def ratio(candidates: Long, n: Long): Double =
    candidates.toDouble / (n.toDouble * (n - 1) / 2)

  test("minhash LSH banding surfaces <10% of the pair space") {
    val sh = TrainingDataQueries.bigramShingles(spark, dir)
    val cands = TrainingDataQueries.minhashCandidates(sh).count()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val r = ratio(cands, n)
    info(f"minhash: $cands candidates of ${n * (n - 1) / 2} pairs (ratio $r%.4f)")
    assert(r < 0.10, f"minhash banding degenerated: ratio $r%.4f")
  }

  test("banded OPH surfaces <10% of the pair space") {
    val sig = TrainingDataQueries.ophSigs(spark, dir)
    val cands = TrainingDataQueries.ophCandidates(sig).count()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val r = ratio(cands, n)
    info(f"oph: $cands candidates of ${n * (n - 1) / 2} pairs (ratio $r%.4f)")
    assert(r < 0.10, f"banded OPH degenerated: ratio $r%.4f")
  }

  test("embedding LSH bands surface <10% of the pair space") {
    val sigs = TrainingDataQueries.bandSigs(spark, dir)
      .select("vec_id", "band", "sig")
    val cands = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"))
      .distinct().count()
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val r = ratio(cands, n)
    info(f"embed-lsh: $cands candidates of ${n * (n - 1) / 2} pairs (ratio $r%.4f)")
    assert(r < 0.10, f"embedding LSH degenerated: ratio $r%.4f")
  }

  test("simhash bit-bands surface <10% of the pair space") {
    val sigs = TrainingDataQueries.simhashDf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = sigs.length.toLong
    // driver-side replay of the two 15/16-bit bands (n is small here;
    // the distributed form is the oracle-gated q_simhash_hamming)
    val byBand = sigs.toSeq.flatMap { case (id, sh) =>
      Seq((0, sh % 32768L, id), (1, sh / 32768L, id))
    }.groupBy(t => (t._1, t._2)).values
    val cands = byBand.flatMap { bucket =>
      val ids = bucket.map(_._3)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet.size.toLong
    val r = ratio(cands, n)
    info(f"simhash: $cands candidates of ${n * (n - 1) / 2} pairs (ratio $r%.4f)")
    assert(r < 0.10, f"simhash banding degenerated: ratio $r%.4f")
  }
}
