package graft.retrieval

import graft.functions.GraftFunctions
import graft.pipeline.VersionedDir
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** IVF-PQ ("IVFADC", Jégou et al. TPAMI 2011 §IV) — the composition of
  * [[VectorIndex]]'s compute pruning with [[PqIndex]]'s storage
  * compression, and the standard billion-scale ANN serving layout:
  *
  *   - a coarse √N-cell quantizer routes each vector to a cell
  *     (deterministic k-means, shared trainer `VectorIndex.trainCentroids`);
  *   - the RESIDUAL `e − centroid(cell)` is product-quantized to m bytes
  *     (shared trainer `PqIndex.train` — residuals carry far less
  *     variance than raw vectors, so the same byte budget quantizes
  *     finer);
  *   - the codes table is PARTITIONED BY CELL, so a probe is a Parquet
  *     partition-pruned scan of `nprobe` cells reading m BYTES per
  *     vector: both prunings compound — scan N·nprobe/nlist rows × m
  *     bytes instead of N rows × d·4 bytes;
  *   - scoring uses the ADC identity `q·e ≈ q·centroid(cell) + Σⱼ
  *     lut[j][codeⱼ]`: one shared per-query LUT (the books quantize
  *     residuals, which are cell-independent here) plus a per-cell
  *     constant, both driver-computed and broadcast;
  *   - [[rerank]] re-scores the fetched candidates against the raw
  *     embeddings table for exact final ordering.
  *
  * Layout (under a [[VersionedDir]] root, atomic rebuilds):
  *   - `centroids` — `(cell:int, centroid:array<double>)`, nlist rows;
  *   - `codebooks` — `(j:int, cid:int, cent:array<double>)`, m×ks rows
  *     (residual-space codewords);
  *   - `codes` — `(chunk_id, codes:binary)` partitioned by `cell`.
  */
object IvfPqIndex {

  val DefaultNprobe = 2

  /** Conventional index root inside an ingestion store. */
  def indexRoot(storeDir: String): String = s"$storeDir/ivfpqindex"

  def centroidsDir(root: String): String = VersionedDir.tableDir(root, "centroids")
  def codebooksDir(root: String): String = VersionedDir.tableDir(root, "codebooks")
  def codesDir(root: String): String = VersionedDir.tableDir(root, "codes")

  def exists(root: String): Boolean = Files.exists(Paths.get(root, "current"))

  /** The `centroids`/`codebooks` table names match [[VectorIndex]] and
    * [[PqIndex]]'s layouts, so their readers apply directly.
    */
  private def loadCentroids(spark: SparkSession, root: String): IndexedSeq[Seq[Double]] =
    VectorIndex.loadCentroids(spark, root)

  def loadBooks(spark: SparkSession, root: String): PqIndex.Books =
    PqIndex.loadBooks(spark, root)

  /** Residual column: `e − centroid(cell)`, against the broadcast
    * centroid literal (element-wise; build/add-time only).
    */
  private def residCol(cents: IndexedSeq[Seq[Double]]) =
    zip_with(col("embedding").cast("array<double>"),
      element_at(typedlit(cents), col("cell") + 1),
      (a, b) => a - b)

  /** Build (or atomically rebuild) from `(chunk_id,
    * embedding:array<float>)` rows. Returns `(nlist, ks)` actually
    * trained.
    */
  def build(emb: DataFrame, root: String, nlist: Option[Int] = None,
      m: Int = PqIndex.DefaultM, ks: Int = PqIndex.DefaultKs,
      iters: Int = PqIndex.DefaultIters): (Int, Int) = {
    require(ks >= 1 && ks <= 256, s"ks must be in [1,256] (byte codes), got $ks")
    val spark = emb.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = emb.select(col("chunk_id"), col("embedding"))

    val n = e.count()
    val k = nlist.getOrElse(VectorIndex.defaultNlist(n))
    val cents = VectorIndex.trainCentroids(e, k, iters)

    // residual frame (chunk_id, cell, embedding := e − centroid(cell));
    // persisted: consumed by the PQ Lloyd rounds AND the codes write
    val resid = e
      .withColumn("cell", VectorIndex.cellCol(cents))
      .withColumn("embedding", residCol(cents))
      .persist()
    try {
      val books = PqIndex.train(resid.select("chunk_id", "embedding"), m, ks, iters)

      val v = VersionedDir.nextVersion(root)
      spark.createDataset(cents.zipWithIndex.map { case (c, i) => (i, c) })
        .toDF("cell", "centroid")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/centroids")
      spark.createDataset(for {
        (book, j) <- books.zipWithIndex
        (cent, c) <- book.zipWithIndex
      } yield (j, c, cent))
        .toDF("j", "cid", "cent")
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/codebooks")
      resid.select(col("chunk_id"), col("cell"),
        PqIndex.encodeCol(books).as("codes"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(s"$root/v$v/codes")
      VersionedDir.flip(root, v)
      VersionedDir.gc(root, v)
      (cents.length, books.head.length)
    } finally resid.unpersist()
  }

  /** Incremental add: assign to the FROZEN centroids, encode the
    * residual against the FROZEN codebooks, append to the cells.
    */
  def add(emb: DataFrame, root: String): Unit = {
    val spark = emb.sparkSession
    GraftFunctions.register(spark)
    val cents = loadCentroids(spark, root)
    val books = loadBooks(spark, root)
    emb.select(col("chunk_id"), col("embedding"))
      .withColumn("cell", VectorIndex.cellCol(cents))
      .withColumn("embedding", residCol(cents))
      .select(col("chunk_id"), col("cell"), PqIndex.encodeCol(books).as("codes"))
      .write.mode(SaveMode.Append).partitionBy("cell")
      .parquet(codesDir(root))
  }

  /** Cascade delete: anti-join rewrite of the codes into a new version
    * (centroids and codebooks frozen — carried over), one pointer flip.
    */
  def delete(spark: SparkSession, ids: DataFrame, idCol: String, root: String): Unit = {
    val v = VersionedDir.nextVersion(root)
    spark.read.parquet(centroidsDir(root)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/centroids")
    spark.read.parquet(codebooksDir(root)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/codebooks")
    spark.read.parquet(codesDir(root))
      .join(broadcast(ids), Seq(idCol), "left_anti")
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$root/v$v/codes")
    VersionedDir.flip(root, v)
    VersionedDir.gc(root, v)
  }

  /** File compaction after many [[add]] batches: rewrite the codes (one
    * file per cell) into a new version; contents unchanged.
    */
  def compact(spark: SparkSession, root: String): Unit = {
    val v = VersionedDir.nextVersion(root)
    spark.read.parquet(centroidsDir(root)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/centroids")
    spark.read.parquet(codebooksDir(root)).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/v$v/codebooks")
    spark.read.parquet(codesDir(root))
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(s"$root/v$v/codes")
    VersionedDir.flip(root, v)
    VersionedDir.gc(root, v)
  }

  /** ADC probe: rank cells by centroid dot on the DRIVER, scan the
    * top-`nprobe` cells' codes (partition-pruned, m bytes per row),
    * score `q·centroid(cell) + graft_pq_adc(codes, lut)`, return the
    * `fetch` best `(chunk_id, adc_score)` candidates.
    */
  def probe(spark: SparkSession, root: String, qv: Array[Float],
      nprobe: Int = DefaultNprobe, fetch: Int = QueryPipeline.PqFetch): DataFrame = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val cents = loadCentroids(spark, root)
    val books = loadBooks(spark, root)
    val qd = qv.map(_.toDouble)
    def dot(c: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(qd.length, c.length)
      while (i < n) { s += qd(i) * c(i); i += 1 }
      s
    }
    val top = cents.zipWithIndex
      .sortBy { case (c, i) => (-dot(c), i) }
      .take(math.max(1, nprobe)).map(_._2)
    val consts = spark.createDataset(top.map(c => (c, dot(cents(c)))))
      .toDF("cell", "cconst")
    val lut = PqIndex.lut(books, qv)
    spark.read.parquet(codesDir(root))
      .filter(col("cell").isin(top: _*))
      .join(broadcast(consts), "cell")
      .select(col("chunk_id"),
        (call_function("graft_pq_adc", col("codes"), typedlit(lut)) +
          col("cconst")).as("adc_score"))
      .orderBy(desc("adc_score"), col("chunk_id"))
      .limit(fetch)
  }

  /** Probe + exact rerank against the raw embeddings table — final
    * `(chunk_id, score)` bit-identical to [[VectorIndex.dotColumn]] on
    * the candidate set.
    */
  def rerank(spark: SparkSession, root: String, qv: Array[Float],
      emb: DataFrame, nprobe: Int, fetch: Int, topK: Int): DataFrame =
    VectorIndex.rerankExact(
      probe(spark, root, qv, nprobe, fetch).select("chunk_id"), emb, qv, topK)
}
