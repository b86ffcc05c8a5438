package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-invariance fuzz for the `graft_topk` aggregate: the result
  * must be identical however rows are scattered across map partitions —
  * that property IS the partial/merge correctness (a buggy `merge` or a
  * non-total comparator shows up as run-to-run or layout-to-layout
  * drift). Reference semantics computed in plain Scala.
  */
class TopKAggFuzzSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    GraftFunctions.register(s)
    s
  }

  test("graft_topk is partition-invariant and matches reference semantics") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 1 to 8) {
      val n = 50 + rnd.nextInt(400)
      // few distinct keys/groups → dense ties, exercising the tie-break
      val rows = Seq.tabulate(n) { _ =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(12).toLong, f"p${rnd.nextInt(64)}%03d")
      }
      val k = 1 + rnd.nextInt(6)

      val want: Map[String, Seq[(Long, String)]] = rows.groupBy(_._1).map {
        case (g, rs) =>
          // selection AND output order: key DESC, payload ASC; duplicates
          // (same key+payload) are individual rows and may co-survive
          g -> rs.map(r => (r._2, r._3))
            .sortBy { case (key, p) => (-key, p) }.take(k)
      }

      for (parts <- Seq(1, 3, 7)) {
        val got = rows.toDF("g", "key", "payload")
          .repartition(parts, col("payload"))
          .groupBy("g")
          .agg(expr(s"graft_topk(key, payload, $k)").as("top"))
          .collect().map { r =>
            r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
              .map(x => (x.getLong(0), x.getString(1)))
          }.toMap
        assert(got == want,
          s"trial $trial parts $parts k $k: $got vs $want")
      }
    }
  }
}
