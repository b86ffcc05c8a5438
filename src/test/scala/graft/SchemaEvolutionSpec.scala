package graft

import graft.pipeline.TableIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Iceberg-style schema evolution over the manifest-committed table
  * layout: a later snapshot's buckets may carry ADDED columns; reading
  * the union of committed buckets with schema merging yields the
  * widened schema, old rows surfacing NULL for the new column — and
  * time travel to the old snapshot still reads the old schema. This is
  * the add-column half of Iceberg's schema evolution contract, which a
  * 10^12-turn table accumulates over months of pipeline versions;
  * column renames/drops map to Iceberg field-id tracking and are out of
  * scope for the parquet-name-based emulation (documented in TableIO).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("added column merges across snapshots; time travel keeps the old schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_evo").toString

    // snapshot 1: buckets 0-1 with (conv_id, text)
    Seq(("c0", "t0"), ("c1", "t1")).toDF("conv_id", "text")
      .write.parquet(s"$dir/bucket=0")
    val m1 = TableIO.commit(dir, TableIO.Empty,
      Seq(TableIO.BucketEntry(0, 2, 0, 0)))

    // snapshot 2: bucket 1 written by a NEWER pipeline adding `quality`
    Seq(("c2", "t2", 0.9), ("c3", "t3", 0.4)).toDF("conv_id", "text", "quality")
      .write.parquet(s"$dir/bucket=1")
    val m2 = TableIO.commit(dir, m1, Seq(TableIO.BucketEntry(1, 2, 0, 0)))

    def bucketPaths(m: TableIO.Manifest): Seq[String] =
      m.completed.keys.toSeq.sorted.map(b => s"$dir/bucket=$b")

    // current read: merged schema, old rows NULL in the new column
    val cur = spark.read.option("mergeSchema", "true")
      .parquet(bucketPaths(m2): _*)
    assert(cur.columns.sorted.toSeq == Seq("conv_id", "quality", "text"))
    val byConv = cur.collect().map(r =>
      r.getString(r.fieldIndex("conv_id")) ->
        (if (r.isNullAt(r.fieldIndex("quality"))) None
         else Some(r.getDouble(r.fieldIndex("quality"))))).toMap
    assert(byConv("c0").isEmpty && byConv("c1").isEmpty,
      "pre-evolution rows surface NULL for the added column")
    assert(byConv("c2").contains(0.9) && byConv("c3").contains(0.4))

    // time travel to snapshot 1: old schema, old rows only
    val old = spark.read.option("mergeSchema", "true")
      .parquet(bucketPaths(TableIO.readAt(dir, 1)): _*)
    assert(old.columns.sorted.toSeq == Seq("conv_id", "text"))
    assert(old.count() == 2)
  }
}
