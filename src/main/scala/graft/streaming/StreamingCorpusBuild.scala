package graft.streaming

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Continuous corpus building — the streaming twin of
  * [[graft.pipeline.CorpusBuild]]: every micro-batch of arriving turns
  * runs the curation funnel (gate → in-batch dedup → HISTORY dedup →
  * decontamination → packing) and appends training shards, exactly
  * once.
  *
  * The part batch CorpusBuild gets for free and a stream must carry is
  * HISTORY: dedup against everything ever kept, and globally
  * consistent packing offsets. Both ride O(1) state in a versioned
  * state file (the `q_bloom_prune` discipline):
  *
  *  - a 256-word (2 KB) Bloom filter over kept content hashes — the
  *    batch probes it as a broadcast literal, so history is NEVER
  *    re-shuffled; Bloom HITS (and only hits) are exactly verified
  *    against the compact fingerprints table with the hit-set
  *    broadcast, so false positives cost a narrow scan, never a wrong
  *    drop;
  *  - a token cursor — this batch's pack offsets start where the last
  *    committed batch ended, so `window_id = off DIV capacity` is
  *    globally consistent across the stream's lifetime.
  *
  * Crash safety: shards and fingerprints are partitioned by batch id;
  * the state file `state/v<batch>.json` is written LAST via tmp +
  * atomic move and doubles as the commit marker. Replay of a committed
  * batch is a no-op; replay of an uncommitted one scrubs its
  * partitions and redoes the work — exactly-once end to end.
  */
object StreamingCorpusBuild {

  val WindowTokens = 512L
  private val BloomWords = 256
  private val BloomK = 4
  private val BloomBits = BloomWords * 63

  def shardsDir(buildDir: String): String = s"$buildDir/shards"
  def fingerprintsDir(buildDir: String): String = s"$buildDir/_history/fingerprints"
  private def stateDir(buildDir: String) = Paths.get(buildDir, "_history", "state")

  final case class State(batchId: Long, cursor: Long, bloom: Array[Long])

  private def render(s: State): String =
    s"""{"batch":${s.batchId},"cursor":${s.cursor},"bloom":[${s.bloom.mkString(",")}]}"""

  private def parse(raw: String): Option[State] = {
    val m = """\{"batch":(\d+),"cursor":(\d+),"bloom":\[([-0-9,]*)\]\}""".r
    raw match {
      case m(b, c, ws) =>
        val words = if (ws.isEmpty) Array.empty[Long]
          else ws.split(',').map(_.toLong)
        if (words.length == BloomWords) Some(State(b.toLong, c.toLong, words))
        else None
      case _ => None
    }
  }

  /** Latest committed state (empty filter, zero cursor before batch 0). */
  def lastState(buildDir: String): State = {
    val d = stateDir(buildDir)
    if (!Files.isDirectory(d)) return State(-1L, 0L, new Array[Long](BloomWords))
    val versions = scala.util.Using.resource(Files.list(d))(_.iterator().asScala
      .map(_.getFileName.toString)
      .flatMap { n =>
        if (n.startsWith("v") && n.endsWith(".json"))
          n.stripPrefix("v").stripSuffix(".json").toLongOption
        else None
      }.toVector.sorted)
    versions.reverse.iterator.flatMap { id =>
      try parse(new String(Files.readAllBytes(d.resolve(s"v$id.json")),
        StandardCharsets.UTF_8))
      catch { case scala.util.control.NonFatal(_) => None }
    }.nextOption().getOrElse(State(-1L, 0L, new Array[Long](BloomWords)))
  }

  private def committed(buildDir: String, batchId: Long): Boolean =
    Files.exists(stateDir(buildDir).resolve(s"v$batchId.json"))

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_)))
    }

  /** Process one micro-batch. Public so specs (and [[foreachBatch]]
    * replays) can drive it directly; idempotent by batch id.
    */
  def processBatch(spark: SparkSession, batch: Dataset[Turn], batchId: Long,
      buildDir: String, evalTrigrams: DataFrame): Unit = {
    if (committed(buildDir, batchId)) return // replay of a committed batch
    // replay of an UNcommitted batch: scrub its partitions, then redo
    deleteTree(Paths.get(shardsDir(buildDir), s"batch_id=$batchId"))
    deleteTree(Paths.get(fingerprintsDir(buildDir), s"batch_id=$batchId"))
    val st = lastState(buildDir)

    // extract + gate (same rules as the batch CorpusBuild)
    val ex = StreamingExtraction.extracted(batch)
      .filter(col("skip_reason") === "")
      .select(col("conv_id"), col("turn_idx"), col("text"))
    val toks = size(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
    val alphaFrac = (length(regexp_replace(col("text"), "[^a-zA-Z]", "")) + 1.0) /
      (length(col("text")) + 1.0)
    val gated = ex.withColumn("n_toks", toks.cast("long"))
      .filter(col("n_toks").between(3, 100000) && alphaFrac > 0.25)
      .withColumn("h", md5(col("text")))

    // in-batch exact dedup, first wins
    val inBatch = gated.withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("conv_id", "turn_idx")))
      .filter(col("rn") === 1).drop("rn")

    // history dedup: broadcast-literal Bloom probe, exact verify on hits
    val bloomLit = typedLit(st.bloom.toSeq)
    val js = explode(typedLit((0 until BloomK).toList)).as("j")
    val withBits = inBatch.select(col("conv_id"), col("turn_idx"), col("h"), js)
      .withColumn("p", pmod(conv(substring(md5(concat(col("h"),
        col("j").cast("string"))), 1, 12), 16, 10).cast("long"), lit(BloomBits.toLong)))
      .withColumn("w", expr("CAST(p DIV 63 AS INT)"))
      .withColumn("m", expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))"))
    val bloomHits = withBits
      .withColumn("set",
        when((element_at(bloomLit, col("w") + 1).bitwiseAND(col("m"))) =!= 0, 1)
          .otherwise(0))
      .groupBy("h").agg((sum("set") === BloomK).as("hit"))
      .filter(col("hit")).select("h")
    val confirmedDups =
      if (!Files.isDirectory(Paths.get(fingerprintsDir(buildDir))))
        spark.emptyDataFrame.selectExpr("'' AS h").limit(0)
      else spark.read.parquet(fingerprintsDir(buildDir))
        .join(broadcast(bloomHits), "h").select("h").distinct()
    val fresh = inBatch.join(broadcast(confirmedDups), Seq("h"), "leftanti")

    // decontamination (keyed broadcast anti-join on eval trigram hashes)
    val withGrams = fresh
      .withColumn("tks", filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      .filter(size(col("tks")) >= 3)
      .select(col("conv_id"), col("turn_idx"),
        explode(expr("transform(sequence(0, size(tks)-3)," +
          " i -> hash(tks[i], tks[i+1], tks[i+2]))")).as("g"))
    val contaminatedIds = withGrams
      .join(broadcast(evalTrigrams.select("g")), "g")
      .select("conv_id", "turn_idx").distinct()
    val clean = fresh.join(contaminatedIds, Seq("conv_id", "turn_idx"), "leftanti")
      .persist()

    // pack from the committed cursor (two-level prefix sum, offsets
    // globally consistent across batches)
    val sharded = clean.withColumn("shard", pmod(xxhash64(col("conv_id")), lit(1L << 12)))
    val inShard = sharded.withColumn("cum", sum("n_toks").over(
      Window.partitionBy("shard").orderBy("conv_id", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bases = sharded.groupBy("shard").agg(sum("n_toks").as("stk"))
      .withColumn("base", sum("stk").over(Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("stk"))
      .select("shard", "base")
    val packed = inShard.join(broadcast(bases), "shard")
      .withColumn("off", lit(st.cursor) + col("base") + col("cum") - col("n_toks"))
      .withColumn("window_id", expr(s"off DIV $WindowTokens"))
      .withColumn("batch_id", lit(batchId))
      .select("batch_id", "conv_id", "turn_idx", "text", "n_toks", "off", "window_id")
      .persist()

    packed.write.mode(SaveMode.Append).partitionBy("batch_id")
      .parquet(shardsDir(buildDir))
    val keptTokens = packed.agg(coalesce(sum("n_toks"), lit(0L))).head().getLong(0)

    // fingerprints of what we KEPT, for future exact verification
    clean.select(col("h"), lit(batchId).as("batch_id"))
      .write.mode(SaveMode.Append).partitionBy("batch_id")
      .parquet(fingerprintsDir(buildDir))

    // fold this batch's kept hashes into the Bloom words (KB-scale agg)
    val newBits = clean.select(col("h"), js)
      .withColumn("p", pmod(conv(substring(md5(concat(col("h"),
        col("j").cast("string"))), 1, 12), 16, 10).cast("long"), lit(BloomBits.toLong)))
      .select(expr("CAST(p DIV 63 AS INT)").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("wd"))
      .collect().map(r => r.getAs[Int]("w") -> r.getAs[Long]("wd")).toMap
    val bloom = st.bloom.clone()
    newBits.foreach { case (w, wd) => bloom(w) |= wd }
    clean.unpersist(); packed.unpersist()

    // commit: state write is the atomic marker, strictly last
    Files.createDirectories(stateDir(buildDir))
    val tmp = stateDir(buildDir).resolve(s"v$batchId.json.tmp")
    Files.write(tmp, render(State(batchId, st.cursor + keptTokens, bloom))
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, stateDir(buildDir).resolve(s"v$batchId.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Continuous build: wire a streaming Dataset[Turn] through
    * [[processBatch]]. Caller invokes `.start()`.
    */
  def writer(turns: Dataset[Turn], buildDir: String, checkpoint: String,
      evalTrigrams: DataFrame): DataStreamWriter[Turn] =
    turns.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Turn], id: Long) =>
        processBatch(batch.sparkSession, batch, id, buildDir, evalTrigrams)
      }
}
