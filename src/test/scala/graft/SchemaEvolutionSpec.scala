package graft

import graft.pipeline.{SchemaEvolution, TableIO}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Iceberg-style schema evolution over the manifest-committed table
  * layout: a later snapshot's buckets may carry ADDED columns; reading
  * the union of committed buckets with schema merging yields the
  * widened schema, old rows surfacing NULL for the new column — and
  * time travel to the old snapshot still reads the old schema. This is
  * the add-column half of Iceberg's schema evolution contract, which a
  * 10^12-turn table accumulates over months of pipeline versions.
  * Column renames/drops need Iceberg's field-id indirection — provided
  * by [[graft.pipeline.SchemaEvolution]]'s schema sidecar (round-3
  * closure of the round-2 gap); the rename/drop round-trips below pin
  * its contract: reads remap by id, drops prune without rewriting data,
  * re-added names take fresh ids, and time travel keeps old names.
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

  // --- field-id evolution (rename / drop) via SchemaEvolution ---------------

  test("rename round-trip: reads remap old files to the new name by field id") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_rename").toString

    // snapshot 1: (conv_id, text) under ids 1, 2
    Seq(("c0", "t0"), ("c1", "t1")).toDF("conv_id", "text")
      .write.parquet(s"$dir/bucket=0")
    val s1 = SchemaEvolution.initial(Seq("conv_id", "text"))
    val m1 = TableIO.commit(dir, TableIO.Empty, Seq(TableIO.BucketEntry(0, 2, 0, 0)))
    SchemaEvolution.commitSchema(dir, m1.snapshotId, s1)

    // snapshot 2: rename text -> body; the new bucket writes `body`
    val s2 = s1.rename("text", "body")
    Seq(("c2", "t2"), ("c3", "t3")).toDF("conv_id", "body")
      .write.parquet(s"$dir/bucket=1")
    val m2 = TableIO.commit(dir, m1, Seq(TableIO.BucketEntry(1, 2, 0, 0)))
    SchemaEvolution.commitSchema(dir, m2.snapshotId, s2)

    val cur = SchemaEvolution.readMerged(spark, dir)
    assert(cur.columns.toSeq == Seq("conv_id", "body"))
    val byConv = cur.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byConv == Map("c0" -> "t0", "c1" -> "t1", "c2" -> "t2", "c3" -> "t3"),
      "old files' `text` must surface under the new name `body`")

    // time travel: snapshot 1 still reads the OLD name over the old bucket
    val old = SchemaEvolution.readMerged(spark, dir, asOf = Some(1L))
    assert(old.columns.toSeq == Seq("conv_id", "text"))
    assert(old.count() == 2)
  }

  test("drop round-trip: dropped column pruned, re-added name is a fresh id") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_drop").toString

    Seq(("c0", "t0", 0.9), ("c1", "t1", 0.4)).toDF("conv_id", "text", "quality")
      .write.parquet(s"$dir/bucket=0")
    val s1 = SchemaEvolution.initial(Seq("conv_id", "text", "quality"))
    val m1 = TableIO.commit(dir, TableIO.Empty, Seq(TableIO.BucketEntry(0, 2, 0, 0)))
    SchemaEvolution.commitSchema(dir, m1.snapshotId, s1)

    // snapshot 2: drop quality — data files keep the column, reads prune it
    val s2 = s1.drop("quality")
    Seq(("c2", "t2"), ("c3", "t3")).toDF("conv_id", "text")
      .write.parquet(s"$dir/bucket=1")
    val m2 = TableIO.commit(dir, m1, Seq(TableIO.BucketEntry(1, 2, 0, 0)))
    SchemaEvolution.commitSchema(dir, m2.snapshotId, s2)

    val cur = SchemaEvolution.readMerged(spark, dir)
    assert(cur.columns.toSeq == Seq("conv_id", "text"))
    assert(cur.count() == 4)

    // time travel to snapshot 1 resurrects the column for OLD data
    val old = SchemaEvolution.readMerged(spark, dir, asOf = Some(1L))
    assert(old.columns.toSeq == Seq("conv_id", "text", "quality"))

    // snapshot 3: re-ADD a column named quality — fresh field id, so the
    // dropped data never resurrects (Iceberg id-reuse rule)
    val s3 = s2.add("quality")
    assert(s3.idOf("quality") != s1.idOf("quality"))
    Seq(("c4", "t4", 1.0)).toDF("conv_id", "text", "quality")
      .write.parquet(s"$dir/bucket=2")
    val m3 = TableIO.commit(dir, m2, Seq(TableIO.BucketEntry(2, 1, 0, 0)))
    SchemaEvolution.commitSchema(dir, m3.snapshotId, s3)

    val cur3 = SchemaEvolution.readMerged(spark, dir)
    val quals = cur3.collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(quals("c0").isEmpty && quals("c1").isEmpty,
      "snapshot-1 quality values must NOT leak into the re-added column")
    assert(quals("c4").contains(1.0))
  }

  test("type widening: merged reads up-cast old buckets; time travel keeps narrow") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_widen").toString

    // snapshot 1: score written as INT, weight as FLOAT
    Seq(("c0", 1, 0.5f), ("c1", 2, 1.5f)).toDF("conv_id", "score", "weight")
      .write.parquet(s"$dir/bucket=0")
    val s1 = SchemaEvolution.initial(Seq("conv_id", "score", "weight"))
    val m1 = TableIO.commit(dir, TableIO.Empty, Seq(TableIO.BucketEntry(0, 2, 0, 0)))
    SchemaEvolution.commitSchema(dir, m1.snapshotId, s1)

    // snapshot 2: widen score int→bigint, weight float→double; the new
    // bucket writes wide types natively
    val s2 = s1.widen("score", "long").widen("weight", "double")
    Seq(("c2", 3000000000L, 2.5d)).toDF("conv_id", "score", "weight")
      .write.parquet(s"$dir/bucket=1")
    val m2 = TableIO.commit(dir, m1, Seq(TableIO.BucketEntry(1, 1, 0, 0)))
    SchemaEvolution.commitSchema(dir, m2.snapshotId, s2)

    val cur = SchemaEvolution.readMerged(spark, dir)
    assert(cur.schema("score").dataType.typeName == "long")
    assert(cur.schema("weight").dataType.typeName == "double")
    val byConv = cur.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(byConv == Map("c0" -> ((1L, 0.5)), "c1" -> ((2L, 1.5)),
      "c2" -> ((3000000000L, 2.5))),
      "old narrow buckets must up-cast exactly; new wide rows read as-is")

    // time travel to snapshot 1: the narrow written types, old rows only
    val old = SchemaEvolution.readMerged(spark, dir, asOf = Some(1L))
    assert(old.schema("score").dataType.typeName == "integer")
    assert(old.schema("weight").dataType.typeName == "float")
    assert(old.count() == 2)

    // widening composes with rename: same id, new name, still wide
    val s3 = s2.rename("score", "points")
    val m3 = TableIO.commit(dir, m2, Nil)
    SchemaEvolution.commitSchema(dir, m3.snapshotId, s3)
    val renamed = SchemaEvolution.readMerged(spark, dir)
    assert(renamed.schema("points").dataType.typeName == "long")
    assert(renamed.select(sum("points")).collect().head.getLong(0) == 3000000003L)

    // monotone: a declared widening cannot change direction
    intercept[IllegalArgumentException](s2.widen("score", "double"))
    // and only safe up-cast targets exist
    intercept[IllegalArgumentException](s1.widen("conv_id", "int"))
  }

  test("writer stamps survive snapshot expiry: expire + rename + readMerged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_expire").toString

    // snapshot 1 writes bucket 0 under (conv_id, text)
    Seq(("c0", "t0")).toDF("conv_id", "text").write.parquet(s"$dir/bucket=0")
    val s1 = SchemaEvolution.initial(Seq("conv_id", "text"))
    val m1 = TableIO.commit(dir, TableIO.Empty, Seq(TableIO.BucketEntry(0, 1, 0, 0)))
    SchemaEvolution.commitSchema(dir, m1.snapshotId, s1)

    // snapshot 2 renames text→body; bucket 1 writes the NEW name
    val s2 = s1.rename("text", "body")
    Seq(("c1", "b1")).toDF("conv_id", "body").write.parquet(s"$dir/bucket=1")
    val m2 = TableIO.commit(dir, m1, Seq(TableIO.BucketEntry(1, 1, 0, 0)))
    SchemaEvolution.commitSchema(dir, m2.snapshotId, s2)
    // snapshot 3: a no-new-bucket commit so snapshot 1 AND 2 can expire
    TableIO.commit(dir, m2, Nil)

    // expire down to the newest snapshot — this deletes BOTH writers'
    // manifest files; the round-3 ADVICE defect re-attributed bucket 0
    // to the oldest SURVIVOR (snapshot 3, schema s2) and projected its
    // parquet as if it had written `body` (silent NULLs)
    TableIO.expireSnapshots(dir, keepLast = 1)
    assert(SchemaEvolution.writerSnapshots(dir) == Map(0 -> 1L, 1 -> 2L),
      "durable writer stamps must survive manifest expiry")

    val cur = SchemaEvolution.readMerged(spark, dir)
    val byConv = cur.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byConv == Map("c0" -> "t0", "c1" -> "b1"),
      "bucket 0's `text` must remap to `body` via its TRUE writer schema")
  }

  test("readMerged with a committed schema but zero committed buckets") {
    val dir = Files.createTempDirectory("graft_schema_empty").toString
    val s1 = SchemaEvolution.initial(Seq("conv_id", "text")).widen("conv_id", "long")
    val m1 = TableIO.commit(dir, TableIO.Empty, Nil)
    SchemaEvolution.commitSchema(dir, m1.snapshotId, s1)
    val empty = SchemaEvolution.readMerged(spark, dir)
    assert(empty.columns.toSeq == Seq("conv_id", "text"))
    assert(empty.schema("conv_id").dataType.typeName == "long")
    assert(empty.count() == 0)
  }

  test("add-column behavior unchanged under the field-id reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_schema_add2").toString
    Seq(("c0", "t0")).toDF("conv_id", "text").write.parquet(s"$dir/bucket=0")
    val s1 = SchemaEvolution.initial(Seq("conv_id", "text"))
    val m1 = TableIO.commit(dir, TableIO.Empty, Seq(TableIO.BucketEntry(0, 1, 0, 0)))
    SchemaEvolution.commitSchema(dir, m1.snapshotId, s1)

    val s2 = s1.add("quality")
    Seq(("c1", "t1", 0.7)).toDF("conv_id", "text", "quality")
      .write.parquet(s"$dir/bucket=1")
    val m2 = TableIO.commit(dir, m1, Seq(TableIO.BucketEntry(1, 1, 0, 0)))
    SchemaEvolution.commitSchema(dir, m2.snapshotId, s2)

    val cur = SchemaEvolution.readMerged(spark, dir)
    assert(cur.columns.toSeq == Seq("conv_id", "text", "quality"))
    val rows = cur.collect().map(r => r.getString(0) -> r.isNullAt(2)).toMap
    assert(rows("c0") && !rows("c1"))
  }
}
