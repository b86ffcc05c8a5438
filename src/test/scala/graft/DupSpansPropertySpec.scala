package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Brute-force property check for `q_dup_spans`: on random corpora with
  * planted duplicate runs, the distributed gram→df→interval-merge plan
  * must agree with a direct in-memory computation of "tokens covered by
  * some 8-gram occurring ≥2 times in the corpus".
  */
class DupSpansPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val N = 8 // must match TrainingDataQueries.DupN

  private def simpleTokens(text: String): Vector[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector

  /** Reference: duplicated-token coverage + merged span count per doc. */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> simpleTokens(t) }
    val gramCount = scala.collection.mutable.Map.empty[Seq[String], Int]
    toks.foreach { case (_, ts) =>
      ts.sliding(N).filter(_.size == N).foreach(g =>
        gramCount(g) = gramCount.getOrElse(g, 0) + 1)
    }
    toks.map { case (id, ts) =>
      val starts = (0 to ts.size - N).filter(i => gramCount(ts.slice(i, i + N)) >= 2)
      // merge overlapping [i, i+N-1] intervals
      var spans = 0L
      var covered = 0L
      var curStart = -1
      var curEnd = -2
      starts.foreach { i =>
        if (curStart < 0) { curStart = i; curEnd = i + N - 1; spans = 1 }
        else if (i <= curEnd) { curEnd = math.max(curEnd, i + N - 1) }
        else { covered += curEnd - curStart + 1; curStart = i; curEnd = i + N - 1; spans += 1 }
      }
      if (curStart >= 0) covered += curEnd - curStart + 1
      id -> (ts.size.toLong, spans, covered)
    }.toMap
  }

  test("q_dup_spans matches brute force on planted-duplicate corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42424242L)
    for (trial <- 1 to 4) {
      val vocab = Vector.tabulate(30)(i => s"w$i")
      val boiler = Vector.tabulate(3)(_ =>
        Vector.fill(N + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
      val docs: Seq[(Long, String)] = Seq.tabulate(40) { id =>
        val body = Vector.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        // ~half the docs get a shared boilerplate run planted at a random point
        val toks =
          if (rnd.nextBoolean()) {
            val b = boiler(rnd.nextInt(boiler.size))
            val cut = if (body.isEmpty) 0 else rnd.nextInt(body.size)
            body.take(cut) ++ b ++ body.drop(cut)
          } else body
        (id.toLong, toks.mkString(" "))
      }.filter(_._2.nonEmpty)

      val dir = Files.createTempDirectory("graft_dupspans").toString
      docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

      val got = SparkEntry.queries("q_dup_spans")(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val want = reference(docs)
      assert(got == want, s"trial $trial:\n got=$got\nwant=$want")
    }
  }
}
