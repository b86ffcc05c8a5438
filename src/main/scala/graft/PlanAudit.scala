package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: dumps physical plans of selected battery queries for
  * scale review (pushdown present? broadcast chosen? shuffle count?).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet
      else Set("q_broadcast_join", "q1_agg", "q_topk_docs", "q_bm25_docs",
        "q_ann_cosine_topk", "q_dedup_exact", "q_page_range_join",
        "q_sessionize", "q_minhash_lsh")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries.filter(q => names.contains(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n================ $name ================")
        val df = fn(spark, dir)
        println(df.queryExecution.executedPlan.toString.take(6000))
        val exchanges = "Exchange".r.findAllIn(
          df.queryExecution.executedPlan.toString).size
        println(s"--- exchange operators: $exchanges")
      }
    spark.stop()
  }
}
