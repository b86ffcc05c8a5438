package graft

import graft.pipeline.VersionedDir
import graft.queries.TrainingDataQueries
import graft.retrieval.IvfPqIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The round-2 verdict's honesty ask for the IVFADC oracle: the battery's
  * `q_ann_ivfpq` is the deliberately UNROLLED SQL form (full scoring of
  * every vector from its own cell — equivalent to `nprobe = nlist`),
  * while the production path is `IvfPqIndex.probe`'s partition-pruned
  * scan of `nprobe < nlist` cells. This spec loads the ORACLE's own
  * quantizers (first-nlist centroids, first-ks residual codebook, the
  * argmin codes) into the index's on-disk layout and pins, for every
  * battery probe:
  *  1. FULL-probe equality — the index path's ADC math (driver cell
  *     ranking, LUT, `graft_pq_adc`, centroid constant) reproduces the
  *     oracle's top-k ids AND 4-dp scores exactly;
  *  2. PRUNED-probe equality at each probe's minimal cell cover — the
  *     smallest nprobe whose cells contain the oracle top-k — asserting
  *     that cover is STRICTLY below nlist: partition pruning loses
  *     nothing once the right cells are probed. (Below the cover the
  *     divergence is the measured recall-vs-nprobe tradeoff, the
  *     q_ann_recall/q_pq_recall family's territory, not an
  *     equivalence bug.)
  */
class IvfPqEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("unrolled IVFADC oracle == partition-pruned IvfPqIndex.probe at nprobe < nlist") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val (emb, cents, routed, cb, codes) = TrainingDataQueries.ivfPqOracleParts(spark, dir)
    val nlist = emb.select("nlist").head().getLong(0).toInt

    // ---- write the oracle quantizers into the IvfPqIndex layout ----
    val root = Files.createTempDirectory("ivfpq_oracle_idx").toString
    cents.select(col("cid").cast("int").as("cell"), col("ce").as("centroid"))
      .coalesce(1).write.parquet(s"$root/v1/centroids")
    cb.select(col("j").cast("int").as("j"), col("cid").cast("int").as("cid"),
        col("cent"))
      .coalesce(1).write.parquet(s"$root/v1/codebooks")
    val cellOf = routed.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val codeRows = codes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1).toSeq
      .map { case (vid, rows) =>
        (vid, cellOf(vid), rows.sortBy(_._2).map(_._3.toByte).toArray)
      }
    spark.createDataset(codeRows).toDF("chunk_id", "cell", "codes")
      .write.partitionBy("cell").parquet(s"$root/v1/codes")
    VersionedDir.flip(root, 1L)

    // ---- battery result per probe ----
    val battery = SparkEntry.queries("q_ann_ivfpq")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(battery.nonEmpty)
    val qvOf = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap

    // driver-side cell ranking, identical to IvfPqIndex.probe's routine
    val centRows = cents.collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray).toMap
    def cellRank(qv: Array[Float]): Seq[Int] = {
      def dot(c: Array[Double]): Double = {
        var s = 0.0; var i = 0
        val n = math.min(qv.length, c.length)
        while (i < n) { s += qv(i).toDouble * c(i); i += 1 }
        s
      }
      centRows.toSeq.sortBy { case (i, c) => (-dot(c), i) }.map(_._1)
    }

    def probeTop(pid: Long, nprobe: Int, k: Int): Seq[(Long, Double)] =
      IvfPqIndex.probe(spark, root, qvOf(pid), nprobe = nprobe,
          fetch = cellOf.size + 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .filter(_._1 != pid) // the oracle excludes the probe itself
        .map { case (vid, sc) => (vid, r4(sc)) }
        .sortBy { case (vid, sc) => (-sc, vid) }
        .take(k).sortBy(_._1).toSeq

    battery.toSeq.sortBy(_._1).foreach { case (pid, oracleRows) =>
      val expect = oracleRows.toSeq
        .map { case (_, vid, sc) => (vid, sc) }.sortBy(_._1)

      // 1. full probe: the ADC math itself must agree exactly
      assert(probeTop(pid, nlist, expect.size) === expect,
        s"probe $pid: FULL index probe diverges from the unrolled oracle")

      // 2. minimal cell cover: strictly pruned, still exact
      val ranked = cellRank(qvOf(pid))
      val needCells = expect.map { case (vid, _) => cellOf(vid) }.toSet
      val cover = ranked.indices.find(i =>
        needCells.subsetOf(ranked.take(i + 1).toSet)).get + 1
      assert(cover < nlist,
        s"probe $pid: top-k spans $cover of $nlist cells — pruning never helps")
      assert(probeTop(pid, cover, expect.size) === expect,
        s"probe $pid: pruned probe (nprobe=$cover of $nlist) diverges " +
          "from the unrolled oracle top-k")
    }
  }
}
