package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog-bucketed tables: the co-located-join discipline for keys that
  * are joined REPEATEDLY at 100 TB scale (doc_id across
  * chunks/embeddings/scores/index tables).
  *
  * Writing both sides `bucketBy(n, key)` with the SAME bucket count pins
  * each side's `outputPartitioning` to the same `HashPartitioning` at
  * SCAN time, so every subsequent equi-join on that key is
  * exchange-free: the corpus-sized shuffle happens ONCE at write time
  * and is amortized over every downstream join — the persisted twin of
  * the in-session `repartition(key)` reuse discipline. `sortBy(key)`
  * additionally lets single-file buckets feed SortMergeJoin without a
  * per-task sort.
  *
  * This is deliberately the Spark-catalog form (`saveAsTable`), not a
  * bare parquet path: bucket metadata lives in the catalog, which is
  * what makes the scan's partitioning TRUSTED by the planner.
  * [[BucketedJoinSpec]] pins the zero-Exchange plan and row parity with
  * the plain shuffled join.
  */
object Bucketing {

  /** Write `df` as a managed catalog table bucketed (and bucket-sorted)
    * by `key` into `nBuckets`. Overwrites any existing table.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two same-bucket-count tables on their bucket key. The
    * plan this produces is the POINT: both scans report the same
    * HashPartitioning, EnsureRequirements inserts no Exchange, and the
    * join runs bucket-aligned.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Drop a table written by [[writeBucketed]] (managed — data files go
    * with it).
    */
  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
