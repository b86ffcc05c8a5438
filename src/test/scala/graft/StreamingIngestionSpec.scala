package graft

import graft.fixtures.TranscriptGen
import graft.model.Turn
import graft.pipeline.{ExtractionPipeline, Ingestion}
import graft.retrieval.{Bm25IndexTables, QueryPipeline}
import graft.streaming.StreamingIngestion
import org.apache.spark.sql.{DataFrame, Dataset}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Continuous end-to-end ingestion (stream → extract → chunk → embed +
  * index): a store fed in micro-batches must be CONTENT-equivalent to a
  * batch-built one, queryable with the unchanged [[QueryPipeline]], and
  * exactly-once under replay — including replay of a batch that crashed
  * mid-append (the two-phase marker protocol's scrub path).
  */
class StreamingIngestionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val NBuckets = 4

  private def turns(convs: Range): Seq[Turn] =
    convs.flatMap(i => TranscriptGen.conversation(11L, i.toLong))

  private def batchStore(convs: Range): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("si-batch").toString
    ExtractionPipeline.run(spark, spark.createDataset(turns(convs)),
      ExtractionPipeline.Config(out, nBuckets = NBuckets, waves = 1, resume = false))
    Ingestion.run(spark, out)
    out
  }

  private def embRows(dir: String): Seq[(String, Int, Int, Seq[Float])] = {
    import spark.implicits._
    spark.read.parquet(dir)
      .select("conv_id", "turn_idx", "chunk_index", "embedding")
      .as[(String, Int, Int, Seq[Float])].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def indexRows(store: String): (Seq[String], Seq[String]) = (
    sortedRows(spark.read.parquet(
      Bm25IndexTables.doclensDir(StreamingIngestion.indexDir(store)))),
    sortedRows(spark.read.parquet(
      Bm25IndexTables.postingsDir(StreamingIngestion.indexDir(store))))
  )

  test("multi-batch stream builds a store content-equal to the batch build") {
    import spark.implicits._
    val base = Files.createTempDirectory("si-e2e").toString
    val landing = s"$base/landing"
    val store = s"$base/store"

    // two landing files → two micro-batches at maxFilesPerTrigger=1
    spark.createDataset(turns(0 until 4)).coalesce(1).write.parquet(landing)
    spark.createDataset(turns(4 until 7)).coalesce(1)
      .write.mode("append").parquet(landing)

    val q = StreamingIngestion.start(spark, landing, store, s"$base/ckpt",
      nBuckets = NBuckets, maxFilesPerTrigger = Some(1))
    q.awaitTermination()

    assert(StreamingIngestion.committedBatches(store).size >= 2,
      "maxFilesPerTrigger must split the drain into multiple committed batches")

    val ref = batchStore(0 until 7)
    assert(embRows(StreamingIngestion.embeddingsDir(store)) ==
      embRows(Ingestion.embeddingsDir(ref)),
      "streamed embeddings == batch embeddings")
    assert(indexRows(store) == (
      sortedRows(spark.read.parquet(Bm25IndexTables.doclensDir(Ingestion.indexDir(ref)))),
      sortedRows(spark.read.parquet(Bm25IndexTables.postingsDir(Ingestion.indexDir(ref))))),
      "streamed BM25 tables == batch BM25 tables")

    val (ok, msg) = Bm25IndexTables.validate(
      spark, StreamingIngestion.indexDir(store), "chunk_id")
    assert(ok, msg)

    // the unchanged query pipeline runs against the streamed store and
    // returns the same fused ranking as against the batch store
    def top(dir: String): Seq[(String, Double)] = {
      import spark.implicits._
      QueryPipeline.query(spark, dir, "tool output table", topK = 5)
        .select("chunk_id", "rrf_score").as[(String, Double)].collect().toSeq
    }
    assert(top(store) == top(ref), "query over streamed store == over batch store")
  }

  test("replay of a committed batch is a no-op") {
    import spark.implicits._
    val store = Files.createTempDirectory("si-replay").toString
    val batch = spark.createDataset(turns(0 until 3))
    val n = StreamingIngestion.processBatch(batch, store, 0L, nBuckets = NBuckets)
    assert(n > 0)
    val before = embRows(StreamingIngestion.embeddingsDir(store))
    val beforeIdx = indexRows(store)
    val n2 = StreamingIngestion.processBatch(batch, store, 0L, nBuckets = NBuckets)
    assert(n2 == 0L, "committed batch replays as a no-op")
    assert(embRows(StreamingIngestion.embeddingsDir(store)) == before)
    assert(indexRows(store) == beforeIdx)
  }

  test("crash replay scrubs only the batch's own chunks when a conversation spans batches") {
    import spark.implicits._
    val store = Files.createTempDirectory("si-span").toString
    // conversation 0 split across the two batches — a conv-keyed scrub
    // would wrongly delete batch 0's committed rows of the same conv
    val conv = TranscriptGen.conversation(11L, 0L)
    val half = conv.size / 2
    val b0 = spark.createDataset(conv.take(half))
    val b1 = spark.createDataset(conv.drop(half) ++ turns(1 until 2))
    StreamingIngestion.processBatch(b0, store, 0L, nBuckets = NBuckets)
    StreamingIngestion.processBatch(b1, store, 1L, nBuckets = NBuckets)
    Files.move(
      Paths.get(store, "_ingest", "1.commit"),
      Paths.get(store, "_ingest", "1.intent"),
      StandardCopyOption.ATOMIC_MOVE)
    StreamingIngestion.processBatch(b1, store, 1L, nBuckets = NBuckets)

    val clean = Files.createTempDirectory("si-span-clean").toString
    StreamingIngestion.processBatch(b0, clean, 0L, nBuckets = NBuckets)
    StreamingIngestion.processBatch(b1, clean, 1L, nBuckets = NBuckets)
    assert(embRows(StreamingIngestion.embeddingsDir(store)) ==
      embRows(StreamingIngestion.embeddingsDir(clean)))
    assert(indexRows(store) == indexRows(clean),
      "batch 0's rows of the shared conversation survive batch 1's replay")
  }

  test("streamed batches extend an existing vector index") {
    import spark.implicits._
    import graft.retrieval.VectorIndex
    val store = Files.createTempDirectory("si-vec").toString
    StreamingIngestion.processBatch(
      spark.createDataset(turns(0 until 3)), store, 0L, nBuckets = NBuckets)
    val nlist = Ingestion.buildVectorIndex(spark, store)
    StreamingIngestion.processBatch(
      spark.createDataset(turns(3 until 5)), store, 1L, nBuckets = NBuckets)

    val qv = Ingestion.hashedEmbedding("tool output table")
    val probed = VectorIndex
      .probe(spark, VectorIndex.indexRoot(store), qv, nprobe = nlist)
      .as[(String, Double)].collect().toMap
    val brute = spark.read.parquet(StreamingIngestion.embeddingsDir(store))
      .select(org.apache.spark.sql.functions.concat_ws(":",
        org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx"),
        org.apache.spark.sql.functions.col("chunk_index")).as("chunk_id"),
        VectorIndex.dotColumn(qv,
          org.apache.spark.sql.functions.col("embedding")).as("score"))
      .as[(String, Double)].collect().toMap
    assert(probed == brute,
      "index extended per batch covers every streamed chunk exactly")
    assert(probed.keys.exists(_.startsWith("conv-000004:")),
      "second batch's conversations are probeable")
  }

  test("streamed batches extend an existing PQ index") {
    import spark.implicits._
    import graft.retrieval.PqIndex
    val store = Files.createTempDirectory("si-pq").toString
    StreamingIngestion.processBatch(
      spark.createDataset(turns(0 until 3)), store, 0L, nBuckets = NBuckets)
    Ingestion.buildPqIndex(spark, store, m = 8, ks = 16)
    StreamingIngestion.processBatch(
      spark.createDataset(turns(3 until 5)), store, 1L, nBuckets = NBuckets)

    val qv = Ingestion.hashedEmbedding("tool output table")
    val n = spark.read.parquet(StreamingIngestion.embeddingsDir(store)).count()
    val scanned = PqIndex
      .scan(spark, PqIndex.indexRoot(store), qv, topK = n.toInt)
      .as[(String, Double)].collect().map(_._1).toSet
    val all = spark.read.parquet(StreamingIngestion.embeddingsDir(store))
      .select(org.apache.spark.sql.functions.concat_ws(":",
        org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx"),
        org.apache.spark.sql.functions.col("chunk_index")).as("chunk_id"))
      .as[String].collect().toSet
    assert(scanned == all,
      "PQ codes extended per batch cover every streamed chunk")
    assert(scanned.exists(_.startsWith("conv-000004:")),
      "second batch's conversations are scannable")
  }

  test("compaction folds batches without changing content or query results") {
    import spark.implicits._
    val store = Files.createTempDirectory("si-compact").toString
    (0 until 3).foreach { b =>
      StreamingIngestion.processBatch(
        spark.createDataset(turns(b * 2 until b * 2 + 2)), store, b.toLong,
        nBuckets = NBuckets)
    }
    val before = embRows(StreamingIngestion.embeddingsDir(store))
    val beforeIdx = indexRows(store)
    def q() = QueryPipeline.query(spark, store, "tool output table", topK = 5)
      .select("chunk_id", "rrf_score").as[(String, Double)].collect().toSeq
    val beforeQ = q()

    StreamingIngestion.compact(spark, store)

    assert(StreamingIngestion.committedBatches(store) == Seq(-1L),
      "three batches fold into one compacted generation")
    import scala.jdk.CollectionConverters._
    val parts = scala.util.Using.resource(
      Files.list(Paths.get(StreamingIngestion.chunksDir(store))))(
      _.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("ingest_batch=")).toVector)
    assert(parts == Vector("ingest_batch=-1"), s"only the fold remains: $parts")
    assert(embRows(StreamingIngestion.embeddingsDir(store)) == before)
    assert(indexRows(store) == beforeIdx)
    assert(q() == beforeQ, "query results unchanged by compaction")

    // the store stays live: a new batch lands beside the fold, and a
    // second compaction folds both into the next generation
    StreamingIngestion.processBatch(
      spark.createDataset(turns(6 until 8)), store, 3L, nBuckets = NBuckets)
    StreamingIngestion.compact(spark, store)
    assert(StreamingIngestion.committedBatches(store) == Seq(-2L))
    val (ok, msg) = Bm25IndexTables.validate(
      spark, StreamingIngestion.indexDir(store), "chunk_id")
    assert(ok, msg)
  }

  test("recover repairs a compaction crash on either side of the commit") {
    import spark.implicits._
    val store = Files.createTempDirectory("si-crashcompact").toString
    (0 until 2).foreach { b =>
      StreamingIngestion.processBatch(
        spark.createDataset(turns(b * 2 until b * 2 + 2)), store, b.toLong,
        nBuckets = NBuckets)
    }
    val before = embRows(StreamingIngestion.embeddingsDir(store))

    // pre-commit crash: intent exists, a partial fold dir exists
    val marker = Paths.get(store, "_ingest", "compact.intent")
    Files.write(marker, "-1\n0\n1".getBytes)
    Files.createDirectories(
      Paths.get(StreamingIngestion.chunksDir(store), "ingest_batch=-1"))
    Files.createDirectories(
      Paths.get(StreamingIngestion.embeddingsDir(store), "ingest_batch=-1"))
    StreamingIngestion.recover(store)
    assert(!Files.exists(marker))
    assert(!Files.exists(
      Paths.get(StreamingIngestion.chunksDir(store), "ingest_batch=-1")),
      "rolled back: partial fold deleted")
    assert(StreamingIngestion.committedBatches(store) == Seq(0L, 1L))
    assert(embRows(StreamingIngestion.embeddingsDir(store)) == before)

    // post-commit crash: fold committed but a folded batch's dir/marker
    // survived — recover must roll forward and finish the cleanup
    StreamingIngestion.compact(spark, store)
    val stale = Paths.get(StreamingIngestion.chunksDir(store), "ingest_batch=0")
    Files.createDirectories(stale)
    Files.write(Paths.get(store, "_ingest", "0.commit"), Array.empty[Byte])
    StreamingIngestion.recover(store)
    assert(!Files.exists(stale), "rolled forward: stale folded dir deleted")
    assert(StreamingIngestion.committedBatches(store) == Seq(-1L))
    assert(embRows(StreamingIngestion.embeddingsDir(store)) == before)
  }

  test("replay after a crash mid-append scrubs the partial batch and re-ingests") {
    import spark.implicits._
    val store = Files.createTempDirectory("si-crash").toString
    val b0 = spark.createDataset(turns(0 until 3))
    val b1 = spark.createDataset(turns(3 until 6))
    StreamingIngestion.processBatch(b0, store, 0L, nBuckets = NBuckets)
    StreamingIngestion.processBatch(b1, store, 1L, nBuckets = NBuckets)

    // simulate the worst-case crash: ALL of batch 1's appends landed but
    // the commit marker did not — demote commit back to intent
    Files.move(
      Paths.get(store, "_ingest", "1.commit"),
      Paths.get(store, "_ingest", "1.intent"),
      StandardCopyOption.ATOMIC_MOVE)

    val n = StreamingIngestion.processBatch(b1, store, 1L, nBuckets = NBuckets)
    assert(n > 0, "replayed batch re-ingests after scrub")

    // equivalence with a clean two-batch store: no duplicates, no loss
    val clean = Files.createTempDirectory("si-clean").toString
    StreamingIngestion.processBatch(b0, clean, 0L, nBuckets = NBuckets)
    StreamingIngestion.processBatch(b1, clean, 1L, nBuckets = NBuckets)
    assert(embRows(StreamingIngestion.embeddingsDir(store)) ==
      embRows(StreamingIngestion.embeddingsDir(clean)))
    assert(indexRows(store) == indexRows(clean))
    val (ok, msg) = Bm25IndexTables.validate(
      spark, StreamingIngestion.indexDir(store), "chunk_id")
    assert(ok, msg)
  }
}
