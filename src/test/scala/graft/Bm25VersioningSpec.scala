package graft

import graft.retrieval.Bm25IndexTables
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot discipline of the BM25 index tables: both tables live under a
  * version dir committed by ONE atomic pointer flip; the previous version
  * survives for in-flight readers; older versions are garbage-collected.
  */
class Bm25VersioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def versionDirs(dir: String): Set[String] =
    scala.util.Using.resource(Files.list(Paths.get(dir)))(
      _.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).toSet)

  test("build flips one pointer covering both tables; delete makes a new version") {
    import spark.implicits._
    val dir = Files.createTempDirectory("bmv").toString
    Bm25IndexTables.build(corpus(1 -> "alpha beta", 2 -> "alpha gamma",
      3 -> "delta epsilon"), "doc_id", "text", dir)
    assert(versionDirs(dir) == Set("v1"))
    assert(Bm25IndexTables.postingsDir(dir).endsWith("v1/postings"))
    assert(Bm25IndexTables.doclensDir(dir).endsWith("v1/doclens"))

    // a reader that resolved BEFORE the delete keeps a consistent pair
    val oldPostings = Bm25IndexTables.postingsDir(dir)
    Bm25IndexTables.delete(spark, Seq(2).toDF("doc_id"), "doc_id", dir)
    assert(versionDirs(dir) == Set("v1", "v2"), "previous version retained")
    assert(Bm25IndexTables.postingsDir(dir).endsWith("v2/postings"))
    assert(Files.exists(Paths.get(oldPostings)), "in-flight readers unbroken")
    assert(spark.read.parquet(Bm25IndexTables.postingsDir(dir))
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2).count() == 0)

    // one more rewrite GCs v1 (keep current + previous only)
    Bm25IndexTables.delete(spark, Seq(3).toDF("doc_id"), "doc_id", dir)
    assert(versionDirs(dir) == Set("v2", "v3"))
    assert(Bm25IndexTables.validate(spark, dir, "doc_id") == (true, "ok"))
  }
}
