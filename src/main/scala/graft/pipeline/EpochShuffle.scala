package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 100 TB form of the per-epoch training shuffle: a deterministic
  * global position for every row WITHOUT a global window.
  *
  * `queries.ScaleQueries.qEpochShuffle` ranks with one `row_number()`
  * per epoch so the DuckDB oracle can mirror it; that window funnels
  * the corpus through one task. This operator produces the IDENTICAL
  * positions (`EpochShuffleSpec` pins row-for-row equality with the
  * window form) with nothing wider than a range shuffle:
  *
  *  1. range-partition by the epoch-keyed hash (each task owns one
  *     contiguous slice of the shuffle order),
  *  2. sort within partitions,
  *  3. convert partition-local indexes to global positions with the
  *     zipWithIndex discipline — per-partition counts (one tiny agg,
  *     `numPartitions` rows to the driver) prefix-summed into offsets
  *     and broadcast back.
  *
  * Epoch-keyed hashing makes the shuffle deterministic AND resumable: a
  * restarted job regenerates the exact batch order, which `rand()`
  * cannot.
  */
object EpochShuffle {

  /** (row, pos) for one epoch: pos is the 1-based global rank of the
    * row under the epoch-keyed hash order — identical to
    * `row_number() OVER (ORDER BY md5(id || '_' || epoch), id)`.
    * The returned frame is persisted (the offset pass re-reads it);
    * callers unpersist when done.
    */
  def positions(df: DataFrame, idCol: String, epoch: Long,
      numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .withColumn("__h", md5(concat_ws("_", col(idCol), lit(epoch))))
      .repartitionByRange(numPartitions, col("__h"), col(idCol))
      .sortWithinPartitions(col("__h"), col(idCol))
      // monotonically_increasing_id = (partition << 33) + local index,
      // assigned along the sorted per-partition iterator
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", expr("shiftright(__mid, 33)"))
      .withColumn("__lidx", expr("__mid & 8589934591"))
      .persist()
    val counts = keyed.groupBy("__pid").agg(count(lit(1)).as("c"))
      .orderBy("__pid").collect()
    var acc = 0L
    val offsets = counts.map { r =>
      val row = (r.getLong(0), acc); acc += r.getLong(1); row
    }.toSeq.toDF("__pid", "__off")
    val out = keyed.join(broadcast(offsets), "__pid")
      .withColumn("pos", col("__off") + col("__lidx") + 1L)
      .drop("__h", "__mid", "__pid", "__lidx", "__off")
      .persist()
    // materialize through the cached intermediate, then release it —
    // downstream actions read `out`'s own cache, so the mono-id pass
    // (which must not recompute: partition-local indexes are only
    // deterministic within one execution) never runs again
    out.count()
    keyed.unpersist()
    out
  }
}
