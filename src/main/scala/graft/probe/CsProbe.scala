package graft.probe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage-timing for q_common_substring (not a driver contract).
  * Usage: runMain graft.probe.CsProbe [sfDir] [reps]
  */
object CsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    // third arg: audit-window chars (0 = FULL TEXT — the production
    // claim's linearity-in-characters measurement, VERDICT r4 #3)
    val winArg = args.lift(2).map(_.toInt).getOrElse(240)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cs-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val CsK = 20; val CsWin = if (winArg <= 0) Int.MaxValue / 4 else winArg
    val CsDfCap = 64; val CsMin = 40
    val gid = expr("CAST(doc_id div 16 AS STRING)")
    def docs: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("text2",
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" sp"), gid, lit("-"),
            md5(concat(lit("pass"), gid)), md5(concat(lit("sage"), gid))))
          .otherwise(col("text")))
      .withColumn("w",
        when(length(col("text2")) > CsWin,
          expr(s"substring(text2, length(text2) - ${CsWin - 1}, $CsWin)"))
          .otherwise(col("text2")))
      .filter(length(col("w")) >= CsK)
    lazy val grams: DataFrame = docs
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, length(w) - ${CsK - 1}), i -> substring(w, i, $CsK))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("g"))
      .persist()
    // round-5 plan: df via one count-only window partitioned by g
    lazy val keep: DataFrame = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("df").between(2, CsDfCap))
      .select("doc_id", "pos", "g").persist()
    lazy val pairs: DataFrame = keep.as("a")
      .join(keep.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    def full: DataFrame = {
      val w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
      pairs.withColumn("diag", col("pa") - col("pb"))
        .withColumn("isl", col("pa") - row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg((count(lit(1)) + lit(CsK - 1).cast("long")).as("run_len"))
        .filter(col("run_len") >= CsMin)
        .groupBy("doc_a", "doc_b")
        .agg(max("run_len").as("max_run"), count(lit(1)).as("n_runs"))
    }
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-12s min=${ts.map(_._1).min}%.2fs rows=${ts.head._2}")
    }
    time("grams")(grams.count())
    time("keep")(keep.count())
    time("pairs")(pairs.count())
    time("full")(full.count())
    spark.stop()
  }
}
