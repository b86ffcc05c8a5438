package graft

import graft.pipeline.DataLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Quantified evidence for the scan-pruning layout claims: the writes in
  * [[DataLayout]] must actually produce parquet files whose footer
  * min/max ranges are narrow — that disjointness IS what file-level
  * pruning (Iceberg metadata, parquet row-group skip) consumes at 100 TB.
  */
class DataLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val docs = "/root/testdata/sf0.001/documents.parquet"

  /** Per-parquet-file (min, max) of `key` — what the reader's pruning
    * sees, measured from the data itself.
    */
  private def fileRanges(path: String, key: String): Seq[(Long, Long)] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(key)).as("mn"), max(col(key)).as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

  test("range-clustered write yields disjoint per-file key ranges") {
    val df = spark.read.parquet(docs).select("doc_id", "n_chars", "lang")
    val out = Files.createTempDirectory("graft_range_layout").toString + "/t"
    DataLayout.writeRangeClustered(df, out, 8, col("n_chars"), col("doc_id"))

    val ranges = fileRanges(out, "n_chars").sortBy(_._1)
    assert(ranges.size >= 4, s"expected several files, got ${ranges.size}")
    // disjoint up to boundary ties: a range partitioner may split rows
    // with equal keys across adjacent partitions, so strict inequality is
    // only required between prev.max and next.min when keys differ
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(bMin >= aMax,
          s"file ranges overlap: prev max $aMax, next min $bMin in $ranges")
      case _ => ()
    }
    // rows survive the layout identically
    val got = spark.read.parquet(out).select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val want = df.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(got.toSeq == want.toSeq)
    // a narrow range predicate now matches ≤ 2 files' footer ranges —
    // the pruning ratio a file-skipping reader achieves on this layout
    val (qLo, qHi) = (ranges(2)._1, ranges(2)._2)
    val matching = ranges.count { case (mn, mx) => mx >= qLo && mn <= qHi }
    assert(matching <= 3, s"range query should touch few files, got $matching of ${ranges.size}")
  }

  test("z-ordered write confines each file to a small (a,b) rectangle") {
    val raw = spark.read.parquet(docs).select("doc_id", "n_chars")
    val hi = raw.agg(max("doc_id"), max("n_chars")).head
    val (idHi, chHi) = (hi.getLong(0).toDouble, hi.getLong(1).toDouble)
    val df = raw
      .withColumn("a16", DataLayout.to16Bit(col("doc_id"), 0, idHi))
      .withColumn("b16", DataLayout.to16Bit(col("n_chars"), 0, chHi))

    def rectFraction(path: String): Double = {
      val rects = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("a16"), max("a16"), min("b16"), max("b16"))
        .collect()
        .map(r => (r.getLong(2) - r.getLong(1) + 1).toDouble *
          (r.getLong(4) - r.getLong(3) + 1).toDouble)
      rects.sum / (rects.length * 65536.0 * 65536.0)
    }

    val base = Files.createTempDirectory("graft_z_layout").toString
    DataLayout.writeZOrdered(df, s"$base/z", 16, col("a16"), col("b16"))
    // baseline: same data, hash-scattered into the same file count
    df.repartition(16).write.parquet(s"$base/plain")

    val zFrac = rectFraction(s"$base/z")
    val plainFrac = rectFraction(s"$base/plain")
    // hash layout: every file spans ~the whole plane (fraction ≈ 1);
    // z-order: each file covers a compact rectangle
    assert(plainFrac > 0.5, s"baseline should span the plane, got $plainFrac")
    assert(zFrac < plainFrac / 3,
      s"z-order should shrink per-file rectangles ≥3x: z=$zFrac plain=$plainFrac")
    // and the layout loses no rows
    assert(spark.read.parquet(s"$base/z").count() == df.count())
  }

  test("zKey interleaves bits (locality sanity)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("a", "b")
      .select(DataLayout.zKey(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 0xFFFFFFFFL))
  }
}
