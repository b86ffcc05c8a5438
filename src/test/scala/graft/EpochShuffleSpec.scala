package graft

import graft.pipeline.EpochShuffle
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-path epoch shuffle must equal the window form EXACTLY —
  * same hash, same order, same 1-based positions — while planning no
  * Window and no single-partition exchange.
  */
class EpochShuffleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("range+offsets positions equal the global-window row_number") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang")
    (0L to 2L).foreach { epoch =>
      val fast = EpochShuffle.positions(docs, "doc_id", epoch, numPartitions = 8)
      try {
        val windowed = docs
          .withColumn("__h", md5(concat_ws("_", col("doc_id"), lit(epoch))))
          .withColumn("wpos", row_number().over(
            Window.orderBy(col("__h"), col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("wpos"))
        val mism = fast.select(col("doc_id"), col("pos"))
          .join(windowed, "doc_id")
          .filter(col("pos") =!= col("wpos")).count()
        assert(mism === 0, s"epoch $epoch: positions diverge from the window form")
        // positions are exactly 1..N
        val n = docs.count()
        val stats = fast.agg(min("pos"), max("pos"),
          countDistinct("pos")).head
        assert(stats.getLong(0) === 1L && stats.getLong(1) === n &&
          stats.getLong(2) === n)
      } finally fast.unpersist()
    }
  }

  test("positions are invariant to the partition count") {
    // the offset math must make parallelism invisible: 1, 3, and 17
    // range partitions all yield the identical global order
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val base = EpochShuffle.positions(docs, "doc_id", 7L, numPartitions = 8)
    try {
      Seq(1, 3, 17).foreach { np =>
        val other = EpochShuffle.positions(docs, "doc_id", 7L, np)
        try {
          val mism = base.select(col("doc_id"), col("pos"))
            .join(other.select(col("doc_id"), col("pos").as("p2")), "doc_id")
            .filter(col("pos") =!= col("p2")).count()
          assert(mism === 0, s"numPartitions=$np changed the global order")
        } finally other.unpersist()
      }
    } finally base.unpersist()
  }

  test("the scale path plans range partitioning and no Window") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val fast = EpochShuffle.positions(docs, "doc_id", 0L, numPartitions = 8)
    try {
      val plan = fast.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"scale path planned a window:\n$plan")
      assert(plan.toLowerCase.contains("rangepartitioning"),
        s"expected a range exchange:\n$plan")
    } finally fast.unpersist()
  }
}
